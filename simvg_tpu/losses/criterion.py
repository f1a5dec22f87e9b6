"""DETR-style set criterion + SimVG distillation losses, fully batched.

Re-implements the reference's loss stack (simvg/core/criterion/
criterion.py:62-287 and the loss orchestration in
simvg/models/heads/tgqs_kd_detr_head/tgqs_kd_detr_head.py:191-572) as
pure, padded, static-shaped jnp functions:

- targets are dense [B, T_max] arrays with a validity mask instead of
  ragged python lists (required under jit; see SURVEY.md "hard parts");
- Hungarian matching runs on device (simvg_tpu.ops.hungarian) instead of
  scipy-on-host;
- the distributed `num_boxes` normalisation (criterion.py:244-249:
  all_reduce(count)/world, clamped at 1, used to divide per-rank sums,
  then DDP-averaged) is reproduced *globally*: dividing the global sum by
  max(global_count, dp_size) yields exactly the same gradients as the
  reference's per-rank formula.

Matcher semantics = detrex HungarianMatcher with ``ce_cost``
(cost = 1 * -prob[target_class] + 5 * L1 + 2 * -GIoU), the configuration
instantiated at tgqs_kd_detr_head.py:132-137.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from simvg_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    box_iou_pairwise,
    generalized_box_iou_pairwise,
)
from simvg_tpu.ops.hungarian import hungarian_assign


class Targets(NamedTuple):
    """Padded per-batch targets.

    labels: int32 [B, T]  (0..num_classes-1 real classes; GRefCOCO
        no-target entries carry label 1 == the no-object class, matching
        prepare_targets at tgqs_kd_detr_head.py:199-204)
    boxes:  f32 [B, T, 4] cxcywh normalised to [0, 1]
    valid:  bool [B, T]
    weight: f32 [B, T] per-target weight (1.0 when unused)
    """

    labels: jnp.ndarray
    boxes: jnp.ndarray
    valid: jnp.ndarray
    weight: jnp.ndarray


def normalize_targets(
    gt_boxes_xyxy: jnp.ndarray,  # [B, T, 4] in image scale
    gt_labels: jnp.ndarray,  # [B, T]
    gt_valid: jnp.ndarray,  # [B, T]
    img_shape: jnp.ndarray,  # [B, 2] (h, w)
) -> Targets:
    """Image-scale xyxy GT -> normalised cxcywh Targets
    (prepare_targets, tgqs_kd_detr_head.py:191-205)."""
    hw = img_shape.astype(jnp.float32)
    scale = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], axis=-1)
    boxes = gt_boxes_xyxy.astype(jnp.float32) / scale[:, None, :]
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    cxcywh = jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )
    return Targets(
        labels=gt_labels.astype(jnp.int32),
        boxes=cxcywh,
        valid=gt_valid.astype(bool),
        weight=jnp.ones_like(gt_valid, jnp.float32),
    )


def _match_costs(
    logits: jnp.ndarray,  # [B, Q, C+1]
    boxes: jnp.ndarray,  # [B, Q, 4] cxcywh
    targets: Targets,
) -> jnp.ndarray:
    """detrex ce_cost matcher costs -> [B, Q, T]."""
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    # cost_class[b, q, t] = -prob[b, q, labels[b, t]]
    cost_class = -jnp.take_along_axis(
        prob, targets.labels[:, None, :], axis=-1
    )
    cost_bbox = jnp.abs(
        boxes[:, :, None, :] - targets.boxes[:, None, :, :]
    ).sum(-1)
    cost_giou = -generalized_box_iou_pairwise(
        box_cxcywh_to_xyxy(boxes), box_cxcywh_to_xyxy(targets.boxes)
    )
    return 1.0 * cost_class + 5.0 * cost_bbox + 2.0 * cost_giou


def hungarian_match(logits, boxes, targets: Targets):
    """Returns (col4row [B, Q] target-or--1, row4col [B, T] query-or--1)."""
    cost = _match_costs(logits, boxes, targets)
    return jax.vmap(hungarian_assign)(cost, targets.valid)


def _per_query_nll(logits, col4row, targets: Targets, num_classes: int,
                   eos_coef: float):
    """Shared CE core: per-query eos-weighted NLL against the matched
    class (no-object for unmatched queries).  Returns (nll*class_w,
    class_w, tgt_cls)."""
    matched = col4row >= 0
    tgt_cls = jnp.where(
        matched,
        jnp.take_along_axis(targets.labels, jnp.clip(col4row, 0), axis=1),
        num_classes,
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt_cls[..., None], axis=-1)[..., 0]
    w = jnp.where(tgt_cls == num_classes, eos_coef, 1.0)
    return w * nll, w, tgt_cls


def _ce_loss(
    logits: jnp.ndarray,  # [B, Q, C+1]
    col4row: jnp.ndarray,  # [B, Q]
    targets: Targets,
    num_classes: int,
    eos_coef: float,
) -> jnp.ndarray:
    """torch F.cross_entropy with the eos class weight
    (criterion.py:103-127): weighted mean over all B*Q logits."""
    wnll, w, _ = _per_query_nll(logits, col4row, targets, num_classes,
                                eos_coef)
    return wnll.sum() / jnp.maximum(w.sum(), 1e-12)


def _focal_loss(
    logits: jnp.ndarray,  # [B, Q, C+1] (last column = no-object, unused)
    col4row: jnp.ndarray,
    targets: Targets,
    num_classes: int,
    num_boxes: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """"focal_loss" class type (criterion.py:31-59, 138-158): sigmoid
    focal loss over ALL logit columns INCLUDING the no-object column —
    the reference builds a [B,Q,C+2] one-hot and drops only the last
    (never-set) column (criterion.py:141-148), so unmatched queries get
    a POSITIVE label at the no-object column and that logit trains."""
    matched = col4row >= 0
    tgt_cls = jnp.where(
        matched,
        jnp.take_along_axis(targets.labels, jnp.clip(col4row, 0), axis=1),
        num_classes,
    )
    onehot = jax.nn.one_hot(tgt_cls, num_classes + 2)[..., :-1]
    x = logits.astype(jnp.float32)
    prob = jax.nn.sigmoid(x)
    ce = jnp.maximum(x, 0) - x * onehot + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = prob * onehot + (1 - prob) * (1 - onehot)
    loss = ce * (1 - p_t) ** gamma
    alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    loss = alpha_t * loss
    # reference: loss.mean(1).sum()/num_boxes * num_queries, which
    # algebraically reduces to the plain sum / num_boxes
    return loss.sum() / num_boxes


def _weighted_ce_loss(
    logits, col4row, row4col, targets: Targets, num_classes: int,
    eos_coef: float, dp_size: int = 1,
) -> jnp.ndarray:
    """"weighted_ce_loss" (criterion.py:128-137): per-query weights 1/10,
    raised to 1.0 at the *matched target indices* (the reference indexes
    the query-weight vector with target indices J — replicated verbatim
    for checkpoint parity), then (w * ce).mean(-1).sum().

    dp_size: the reference SUMS over its per-rank batch and DDP grad
    averaging divides by world; on the pjit global batch the same
    gradients require sum_global / dp_size."""
    ce, _, _ = _per_query_nll(logits, col4row, targets, num_classes,
                              eos_coef)  # reduction="none" semantics

    b, q = col4row.shape
    t = targets.valid.shape[1]
    # weight[b, j] = 1.0 for matched target index j, else 0.1
    qw = jnp.full((b, q), 0.1, jnp.float32)
    tgt_matched = (row4col >= 0) & targets.valid  # [B, T]
    pad = jnp.zeros((b, q - t), bool) if q > t else None
    tm = (
        jnp.concatenate([tgt_matched, pad], axis=1) if pad is not None
        else tgt_matched[:, :q]
    )
    qw = jnp.where(tm, 1.0, qw)
    return (qw * ce).mean(-1).sum() / dp_size


def _box_losses(
    boxes: jnp.ndarray,  # [B, Q, 4]
    col4row: jnp.ndarray,
    targets: Targets,
    num_boxes: jnp.ndarray,
    pair_weight: bool,
):
    """L1 + GIoU over matched pairs, / num_boxes
    (criterion.py:164-204)."""
    matched = col4row >= 0
    idx = jnp.clip(col4row, 0)
    tgt_boxes = jnp.take_along_axis(targets.boxes, idx[..., None], axis=1)
    m = matched.astype(jnp.float32)

    l1 = jnp.abs(boxes - tgt_boxes).sum(-1)
    giou = generalized_box_iou_pairwise(
        box_cxcywh_to_xyxy(boxes.reshape(-1, 1, 4)),
        box_cxcywh_to_xyxy(tgt_boxes.reshape(-1, 1, 4)),
    ).reshape(boxes.shape[:2])
    loss_giou_el = 1.0 - giou

    if pair_weight:
        w = jnp.take_along_axis(targets.weight, idx, axis=1)
        l1 = l1 * w
        loss_giou_el = loss_giou_el * w

    loss_bbox = (l1 * m).sum() / num_boxes
    loss_giou = (loss_giou_el * m).sum() / num_boxes
    return loss_bbox, loss_giou


def set_criterion(
    all_logits: jnp.ndarray,  # [L, B, Q, C+1]
    all_boxes: jnp.ndarray,  # [L, B, Q, 4]
    targets: Targets,
    *,
    num_classes: int = 1,
    eos_coef: float = 0.1,
    loss_class_type: str = "ce_loss",
    dp_size: int = 1,
    weight_dict: Optional[Dict[str, float]] = None,
    gt_count: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """SetCriterion forward incl. aux losses (criterion.py:226-271) with
    the head's weight_dict applied (calc_loss,
    tgqs_kd_detr_head.py:340-350).

    Every decoder layer is re-matched independently, exactly like the
    reference's aux loop.  Returns {"loss_class", "loss_bbox",
    "loss_giou", ..._i} already weight-scaled, plus "total".

    gt_count: optional [B] UNTRUNCATED per-sample object-GT counts.
    When targets were truncated to num_queries (GRefCOCO images with
    more targets than queries), the reference's num_boxes still counts
    the full ragged target list (criterion.py:244-249) even though its
    matcher can only pair num_queries of them — pass the untruncated
    counts here to reproduce that normalisation.
    """
    if weight_dict is None:
        weight_dict = {"loss_class": 1.0, "loss_bbox": 5.0,
                       "loss_giou": 2.0}
    num_layers = all_logits.shape[0]

    if gt_count is not None:
        count = gt_count.astype(jnp.float32).sum()
    else:
        count = targets.valid.sum().astype(jnp.float32)
    # Equivalent to the reference's clamp(all_reduce(count)/world, 1)
    # divided per-rank then DDP-averaged; see module docstring.
    num_boxes = jnp.maximum(count, float(dp_size))

    pair_weight = loss_class_type == "weighted_ce_loss"
    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for layer in range(num_layers):
        logits = all_logits[layer]
        boxes = all_boxes[layer]
        col4row, row4col = hungarian_match(logits, boxes, targets)
        if loss_class_type == "weighted_ce_loss":
            lc = _weighted_ce_loss(logits, col4row, row4col, targets,
                                   num_classes, eos_coef,
                                   dp_size=dp_size)
        elif loss_class_type == "focal_loss":
            lc = _focal_loss(logits, col4row, targets, num_classes,
                             num_boxes)
        else:
            lc = _ce_loss(logits, col4row, targets, num_classes, eos_coef)
        lb, lg = _box_losses(boxes, col4row, targets, num_boxes,
                             pair_weight)
        suffix = "" if layer == num_layers - 1 else f"_{layer}"
        lc = lc * weight_dict["loss_class"]
        lb = lb * weight_dict["loss_bbox"]
        lg = lg * weight_dict["loss_giou"]
        losses[f"loss_class{suffix}"] = lc
        losses[f"loss_bbox{suffix}"] = lb
        losses[f"loss_giou{suffix}"] = lg
        total = total + lc + lb + lg
    losses["total"] = total
    return losses


def prepare_soft_targets(
    teacher_logits: jnp.ndarray,  # [B, Q, C+1] (will be stop-gradiented)
    teacher_boxes: jnp.ndarray,  # [B, Q, 4]
    targets_gt: Targets,
    prepare_target_mode: str = "score_iou_weighted",
    predict_threshold: float = 0.0,
):
    """Teacher-derived distillation targets
    (tgqs_kd_detr_head.py:207-268).

    score_iou_weighted: match the (detached) decoder branch to the
    object-only GT; each matched teacher query becomes a distill target
    with weight = P(class 0) * IoU(teacher box, gt box).

    score_weighted: every teacher query above the score threshold (0.0 in
    all shipped configs -> all queries) becomes a target with weight =
    its score.

    Returns (targets_pred: Targets, weights_distill: scalar mean weight).
    """
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    teacher_boxes = jax.lax.stop_gradient(teacher_boxes)
    scores = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)[
        ..., 0
    ]  # P(object class 0), tgqs_kd_detr_head.py:213

    if prepare_target_mode == "score_weighted":
        b, q = scores.shape
        # as_target_query_thr (tgqs_kd_detr_head.py:238-247)
        valid = scores > predict_threshold
        tp = Targets(
            labels=jnp.zeros((b, q), jnp.int32),
            boxes=teacher_boxes,
            valid=valid,
            weight=scores * valid,
        )
        # reference weights_distill: torch.mean over the CONCATENATED
        # full-length weight vectors (zeros below threshold), i.e.
        # divide by B*Q — not by the above-threshold count
        # (tgqs_kd_detr_head.py:240-247, 491)
        wd = (tp.weight * tp.valid).sum() / (b * q)
        return tp, wd

    assert prepare_target_mode == "score_iou_weighted", prepare_target_mode

    # GT restricted to real objects (GRefCOCO no-target rows dropped,
    # tgqs_kd_detr_head.py:222-229).
    obj_valid = targets_gt.valid & (targets_gt.labels == 0)
    gt_obj = targets_gt._replace(valid=obj_valid)

    col4row, row4col = hungarian_match(teacher_logits, teacher_boxes,
                                       gt_obj)
    # For GT slot t matched to teacher query j = row4col[t]:
    matched = (row4col >= 0) & obj_valid  # [B, T]
    qidx = jnp.clip(row4col, 0)
    t_box = jnp.take_along_axis(teacher_boxes, qidx[..., None], axis=1)
    t_score = jnp.take_along_axis(scores, qidx, axis=1)
    iou = box_iou_pairwise(
        box_cxcywh_to_xyxy(t_box.reshape(-1, 1, 4)),
        box_cxcywh_to_xyxy(targets_gt.boxes.reshape(-1, 1, 4)),
    )[0].reshape(matched.shape)
    weight = t_score * iou

    targets_pred = Targets(
        labels=jnp.zeros_like(targets_gt.labels),
        boxes=t_box,
        valid=matched,
        weight=jnp.where(matched, weight, 0.0),
    )
    weights_distill = (targets_pred.weight).sum() / jnp.maximum(
        matched.sum(), 1
    )
    return targets_pred, weights_distill


def prepare_merge_targets(
    teacher_logits: jnp.ndarray,
    teacher_boxes: jnp.ndarray,
    targets_gt: Targets,
) -> Targets:
    """"merge" branch targets (prepare_merge_target,
    tgqs_kd_detr_head.py:270-314): GT targets (weight 1) concatenated
    with the teacher's matched boxes (weight = score * IoU).  Requires
    2 * T_max <= num_queries for the downstream matcher."""
    tp, _ = prepare_soft_targets(teacher_logits, teacher_boxes,
                                 targets_gt, "score_iou_weighted")
    return Targets(
        labels=jnp.concatenate([targets_gt.labels, tp.labels], axis=1),
        boxes=jnp.concatenate([targets_gt.boxes, tp.boxes], axis=1),
        valid=jnp.concatenate([targets_gt.valid, tp.valid], axis=1),
        weight=jnp.concatenate(
            [jnp.ones_like(targets_gt.weight), tp.weight], axis=1
        ),
    )


def simvg_branch_losses(
    head_out: Dict[str, jnp.ndarray],
    targets_gt: Targets,
    *,
    branch_loss_weight: Dict,
    num_classes: int = 1,
    eos_coef: float = 0.1,
    prepare_target_mode: str = "score_iou_weighted",
    distill_type: str = "hard_weighted",
    mlp_aux_loss: bool = False,
    as_target_query_thr: float = 0.0,
    dp_size: int = 1,
    gt_count: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Branch loss orchestration (forward_train,
    tgqs_kd_detr_head.py:456-572).

    Supported branch_loss_weight keys: "decoder", "balanced_distill"
    ({"token": w, "distill": w}), "token", "distill".

    gt_count: optional [B] untruncated object-GT counts — feeds the
    num_boxes of every GT-target criterion call (see set_criterion);
    distill targets keep their own matched counts (the reference counts
    len(targets_pred) for those calls).
    """
    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0

    # The reference's targets_gt for ALL GT losses comes from
    # prepare_soft_targets, which DROPS GRefCOCO no-target rows
    # (category_id == -1) entirely (tgqs_kd_detr_head.py:222-231,
    # 472-474): they never become Hungarian targets, contribute no box
    # loss, and don't count in num_boxes. label 1 marks those rows in
    # our padded layout.
    targets_gt = targets_gt._replace(
        valid=targets_gt.valid & (targets_gt.labels == 0)
    )

    cls_dec = head_out["class_decoder"]
    box_dec = head_out["bbox_decoder"]
    cls_tok = head_out["class_token"]
    box_tok = head_out["bbox_token"]

    kw = dict(num_classes=num_classes, eos_coef=eos_coef, dp_size=dp_size)
    kw_gt = dict(kw, gt_count=gt_count)

    if "decoder" in branch_loss_weight:
        d = set_criterion(cls_dec, box_dec, targets_gt, **kw_gt)
        loss_dgt = branch_loss_weight["decoder"] * d["total"]
        losses["loss_dgt"] = loss_dgt
        total = total + loss_dgt

    # Token-branch outputs: last MLP layer only unless mlp_aux_loss
    # (tgqs_kd_detr_head.py:493-498).
    if not mlp_aux_loss:
        cls_tok_ = cls_tok[-1:]
        box_tok_ = box_tok[-1:]
    else:
        cls_tok_, box_tok_ = cls_tok, box_tok

    if "balanced_distill" in branch_loss_weight:
        bw = branch_loss_weight["balanced_distill"]
        targets_pred, wd = prepare_soft_targets(
            cls_dec[-1], box_dec[-1], targets_gt,
            prepare_target_mode=prepare_target_mode,
            predict_threshold=as_target_query_thr,
        )
        t = set_criterion(cls_tok_, box_tok_, targets_gt, **kw_gt)
        loss_tgt = bw["token"] * t["total"] * (1.0 - wd)
        losses["loss_tgt"] = loss_tgt

        k = set_criterion(cls_tok_, box_tok_, targets_pred, **kw)
        loss_kd = bw["distill"] * k["total"] * wd
        losses["loss_kd"] = loss_kd
        losses["loss_distill_w"] = wd
        total = total + loss_tgt + loss_kd
    else:
        if "token" in branch_loss_weight:
            t = set_criterion(cls_tok_, box_tok_, targets_gt, **kw_gt)
            loss_tgt = branch_loss_weight["token"] * t["total"]
            losses["loss_tgt"] = loss_tgt
            total = total + loss_tgt
        if "distill" in branch_loss_weight:
            targets_pred, _ = prepare_soft_targets(
                cls_dec[-1], box_dec[-1], targets_gt,
                prepare_target_mode=prepare_target_mode,
                # the reference passes as_target_query_thr to its one
                # prepare_soft_targets call for every branch
                # (tgqs_kd_detr_head.py:472-474)
                predict_threshold=as_target_query_thr,
            )
            if distill_type == "hard_weighted":
                k = set_criterion(
                    cls_tok_, box_tok_, targets_pred,
                    loss_class_type="weighted_ce_loss", **kw
                )
            elif distill_type == "hard":
                k = set_criterion(cls_tok_, box_tok_, targets_pred, **kw)
            elif distill_type == "soft":
                from .distill import soft_distill_losses

                k = soft_distill_losses(
                    cls_tok_, box_tok_,
                    cls_dec[-1], box_dec[-1],
                )
            else:
                raise ValueError(f"unknown distill_type {distill_type!r}")
            loss_kd = branch_loss_weight["distill"] * k["total"]
            losses["loss_kd"] = loss_kd
            total = total + loss_kd

    if "merge" in branch_loss_weight:
        targets_merge = prepare_merge_targets(cls_dec[-1], box_dec[-1],
                                              targets_gt)
        m = set_criterion(cls_tok, box_tok, targets_merge, **kw)
        loss_merge = branch_loss_weight["merge"] * m["total"]
        losses["loss_merge"] = loss_merge
        total = total + loss_merge

    losses["loss_total"] = total
    return losses
