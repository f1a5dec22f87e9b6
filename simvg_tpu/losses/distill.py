"""Soft knowledge-distillation criterion (distill_type="soft").

Equivalent of the reference's DistillCriterion + DistillHungarianAssigner
+ DistillCrossEntropyLoss stack (simvg/core/criterion/
distill_criterion.py:18-522, distill_hungarian_assigner.py:16-131,
distill_cross_entropy_loss.py:152-251, match_cost.py:9-70): the student
(token branch) is matched query-to-query against the *detached* teacher
(decoder branch) with a soft-label BCE + L1 + GIoU cost, then trained
with BCE against the teacher's soft object probability and L1 + GIoU
against the teacher's boxes.

Faithfulness note: NO shipped config exercises this path (they all use
``distill_type="hard_weighted"`` with ``balanced_distill``, which routes
through the plain SetCriterion — tgqs_kd_detr_head.py:489-509).  The
reference soft path also mixes units (it passes normalised cxcywh teacher
boxes into an assigner that expects image-scale xyxy,
distill_criterion.py:352-re-normalisation) and feeds raw logits where the
BCE expects probabilities.  This implementation keeps the intended
semantics with consistent units: teacher boxes stay normalised cxcywh,
soft labels are sigmoid(teacher logits).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from simvg_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    generalized_box_iou_pairwise,
)
from simvg_tpu.ops.hungarian import hungarian_assign


def _bce_with_logits(logits, targets):
    """Elementwise binary cross entropy with logits (stable)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def soft_distill_losses(
    student_logits: jnp.ndarray,  # [L, B, Q, C+1]
    student_boxes: jnp.ndarray,  # [L, B, Q, 4] cxcywh normalised
    teacher_logits: jnp.ndarray,  # [B, Q, C+1] (final teacher layer)
    teacher_boxes: jnp.ndarray,  # [B, Q, 4] cxcywh normalised
    *,
    cls_weight: float = 1.0,
    bbox_weight: float = 5.0,
    giou_weight: float = 2.0,
) -> Dict[str, jnp.ndarray]:
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    teacher_boxes = jax.lax.stop_gradient(teacher_boxes)
    # soft object-ness target: P(class 0) of the teacher
    t_prob = jax.nn.sigmoid(teacher_logits[..., 0]).astype(jnp.float32)

    num_layers, b, q, _ = student_logits.shape
    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for layer in range(num_layers):
        s_log = student_logits[layer].astype(jnp.float32)
        s_box = student_boxes[layer].astype(jnp.float32)

        # --- assignment costs (DistillHungarianAssigner semantics):
        # BCE(student object logit, teacher soft label) + L1 + GIoU
        s_obj = s_log[..., 0]
        pos = _bce_with_logits(s_obj, jnp.ones_like(s_obj))
        neg = _bce_with_logits(s_obj, jnp.zeros_like(s_obj))
        cls_cost = (pos[:, :, None] * t_prob[:, None, :]
                    + neg[:, :, None] * (1.0 - t_prob[:, None, :]))
        bbox_cost = jnp.abs(
            s_box[:, :, None, :] - teacher_boxes[:, None, :, :]
        ).sum(-1)
        giou_cost = -generalized_box_iou_pairwise(
            box_cxcywh_to_xyxy(s_box), box_cxcywh_to_xyxy(teacher_boxes)
        )
        cost = (cls_weight * cls_cost + bbox_weight * bbox_cost
                + giou_weight * giou_cost)
        col4row, _ = jax.vmap(hungarian_assign)(
            cost, jnp.ones((b, q), bool)
        )
        idx = jnp.clip(col4row, 0)

        # --- losses on matched pairs (all Q match: T == Q)
        t_prob_m = jnp.take_along_axis(t_prob, idx, axis=1)
        t_box_m = jnp.take_along_axis(teacher_boxes, idx[..., None],
                                      axis=1)
        denom = float(b * q)
        l_cls = _bce_with_logits(s_obj, t_prob_m).sum() / denom
        l_l1 = jnp.abs(s_box - t_box_m).sum() / denom
        giou = generalized_box_iou_pairwise(
            box_cxcywh_to_xyxy(s_box.reshape(-1, 1, 4)),
            box_cxcywh_to_xyxy(t_box_m.reshape(-1, 1, 4)),
        ).reshape(b, q)
        l_giou = (1.0 - giou).sum() / denom

        suffix = "" if layer == num_layers - 1 else f"_d{layer}"
        losses[f"loss_cls_distill{suffix}"] = cls_weight * l_cls
        losses[f"loss_bbox_distill{suffix}"] = bbox_weight * l_l1
        losses[f"loss_iou_distill{suffix}"] = giou_weight * l_giou
        total = total + cls_weight * l_cls + bbox_weight * l_l1 \
            + giou_weight * l_giou
    losses["total"] = total
    return losses
