"""Pure-jnp box operations.

Semantics match the reference stack's box utilities (detrex
`layers/box_ops.py`, used by simvg/models/heads/tgqs_kd_detr_head/
tgqs_kd_detr_head.py:7 and simvg/core/criterion/criterion.py:27), but are
written batched-first so they vectorise on the VPU: every function accepts
arbitrary leading batch dimensions and never materialises python lists.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [0.5 * (x1 + x2), 0.5 * (y1 + y2), x2 - x1, y2 - y1], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [..., 4] xyxy boxes -> [...]."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU of xyxy boxes.

    boxes1: [..., N, 4], boxes2: [..., M, 4] -> (iou [..., N, M], union).
    Mirrors detrex `box_iou` (also vendored at simvg/apis/test.py:30-43).
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-12)
    return iou, union


def box_iou_aligned(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of aligned xyxy boxes [..., 4] -> [...].

    Matches mmdet `bbox_overlaps(..., is_aligned=True)` used for the
    Prec@0.5 metric (simvg/apis/test.py:78), including its eps handling
    (union clamped to eps=1e-6).
    """
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1) + box_area(boxes2) - inter
    return inter / jnp.maximum(union, 1e-6)


def generalized_box_iou_pairwise(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> jnp.ndarray:
    """Pairwise GIoU of xyxy boxes [..., N, 4] x [..., M, 4] -> [..., N, M].

    Mirrors detrex `generalized_box_iou` (simvg/apis/test.py:46-67).  Unlike
    the reference we do not assert well-formedness (no data-dependent python
    control flow under jit); degenerate boxes are guarded by eps clamps.
    """
    iou, union = box_iou_pairwise(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-12)


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clip xyxy boxes to [0, width] x [0, height].

    Equivalent to detectron2 `Boxes.clip` inside `detector_postprocess`
    (used by simvg/models/det_seg/mix_detr_mb.py:141).  `height`/`width`
    may be scalars or arrays broadcastable against the leading dims.
    """
    height = jnp.asarray(height, boxes.dtype)
    width = jnp.asarray(width, boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0.0, width)
    y1 = jnp.clip(boxes[..., 1], 0.0, height)
    x2 = jnp.clip(boxes[..., 2], 0.0, width)
    y2 = jnp.clip(boxes[..., 3], 0.0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
