"""Legacy loss components kept for registry-surface parity.

- label_smooth_ce: LabelSmoothCrossEntropyLoss
  (reference simvg/core/losses/label_smooth.py:7-40): smoothed one-hot
  cross entropy with optional per-element weights, mean-reduced over
  batch*num_pts (mmdet weight_reduce_loss avg_factor semantics).
- box_loss: BoxLoss (reference simvg/models/losses/boxloss.py:9-33):
  5 * L1 + 2 * (1 - GIoU) over cxcywh box pairs, summed / batch.

Neither is used by any shipped SimVG config (legacy SeqTR/VGTR era);
both are pure-jnp and jit/grad-safe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from simvg_tpu.ops.boxes import (box_cxcywh_to_xyxy,
                                 generalized_box_iou_pairwise)


def label_smooth_ce(
    logits: jnp.ndarray,  # [B, N, C]
    targets: jnp.ndarray,  # [B, N] int class ids
    weight: Optional[jnp.ndarray] = None,  # [B, N] or broadcastable
    neg_factor: float = 0.1,
) -> jnp.ndarray:
    """Label-smoothed CE, mean over B*N (label_smooth.py:17-40)."""
    b, n, c = logits.shape
    logits = logits.reshape(-1, c).astype(jnp.float32)
    tgt = targets.reshape(-1)
    label_pos = 1.0 - neg_factor
    label_neg = neg_factor / c
    one_hot = jnp.full((b * n, c), label_neg, jnp.float32)
    one_hot = one_hot.at[jnp.arange(b * n), tgt].set(label_pos)
    one_hot = jax.lax.stop_gradient(one_hot)
    logs = jax.nn.log_softmax(logits, axis=1)
    loss = -jnp.sum(logs * one_hot, axis=1)
    if weight is not None:
        loss = loss * weight.reshape(-1).astype(jnp.float32)
    # avg_factor = batch_size * num_pts (label_smooth.py:36-38)
    return jnp.sum(loss) / (b * n)


def box_loss(
    pred_cxcywh: jnp.ndarray,  # [B, 4]
    gt_cxcywh: jnp.ndarray,  # [B, 4]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (total, 5*l1, 2*giou) exactly like BoxLoss.forward
    (boxloss.py:16-33)."""
    bs = pred_cxcywh.shape[0]
    l1 = jnp.abs(pred_cxcywh - gt_cxcywh).sum() / bs
    giou = generalized_box_iou_pairwise(
        box_cxcywh_to_xyxy(pred_cxcywh), box_cxcywh_to_xyxy(gt_cxcywh)
    )
    loss_giou = (1.0 - jnp.diagonal(giou)).sum() / bs
    return 5.0 * l1 + 2.0 * loss_giou, 5.0 * l1, 2.0 * loss_giou


def mdetr_hungarian_match(
    pred_logits: jnp.ndarray,  # [B, Q, num_tokens]
    pred_boxes: jnp.ndarray,  # [B, Q, 4] cxcywh
    tgt_boxes: jnp.ndarray,  # [B, T, 4] cxcywh (padded)
    tgt_valid: jnp.ndarray,  # [B, T] bool
    positive_map: jnp.ndarray,  # [B, T, num_tokens] soft token targets
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
):
    """The mdetr HungarianMatcher (reference simvg/core/matcher.py:12-85,
    unused by shipped configs, kept for inventory parity).

    Distinguishing feature vs the detrex matcher: the class cost is the
    SOFT-TOKEN alignment cost ``-(softmax(logits) . positive_map)``
    (matcher.py:69) instead of -prob[label].  Batched/padded and
    device-resident (jnp Hungarian) instead of ragged scipy-on-host.

    Returns (col4row [B, Q] target-or--1, row4col [B, T] query-or--1).
    """
    from simvg_tpu.ops.hungarian import hungarian_assign

    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    cc = -jnp.einsum("bqv,btv->bqt", prob,
                     positive_map.astype(jnp.float32))
    cb = jnp.abs(
        pred_boxes[:, :, None, :] - tgt_boxes[:, None, :, :]
    ).sum(-1)
    cg = -generalized_box_iou_pairwise(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )
    cost = cost_class * cc + cost_bbox * cb + cost_giou * cg
    return jax.vmap(hungarian_assign)(cost, tgt_valid.astype(bool))
