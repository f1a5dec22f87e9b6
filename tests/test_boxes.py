import jax.numpy as jnp
import numpy as np
import pytest

from simvg_tpu.ops import (
    box_area,
    box_cxcywh_to_xyxy,
    box_iou_aligned,
    box_iou_pairwise,
    box_xyxy_to_cxcywh,
    clip_boxes,
    generalized_box_iou_pairwise,
)


def _rand_xyxy(rng, n):
    x1y1 = rng.uniform(0, 50, (n, 2))
    wh = rng.uniform(1, 50, (n, 2))
    return np.concatenate([x1y1, x1y1 + wh], axis=1).astype(np.float32)


def test_cxcywh_roundtrip():
    rng = np.random.default_rng(0)
    b = _rand_xyxy(rng, 32)
    out = box_cxcywh_to_xyxy(box_xyxy_to_cxcywh(jnp.asarray(b)))
    np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-4)


def test_area_and_iou_identity():
    b = jnp.asarray([[0.0, 0.0, 2.0, 2.0], [1.0, 1.0, 3.0, 5.0]])
    np.testing.assert_allclose(box_area(b), [4.0, 8.0])
    iou, union = box_iou_pairwise(b, b)
    np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-6)


def test_pairwise_iou_vs_manual():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0, 3.0], [10.0, 10.0, 12.0, 12.0]])
    iou, _ = box_iou_pairwise(a, b)
    np.testing.assert_allclose(iou, [[1.0 / 7.0, 0.0]], atol=1e-6)


def test_aligned_iou_matches_pairwise_diag():
    rng = np.random.default_rng(1)
    a, b = _rand_xyxy(rng, 16), _rand_xyxy(rng, 16)
    full, _ = box_iou_pairwise(jnp.asarray(a), jnp.asarray(b))
    aligned = box_iou_aligned(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(aligned, np.diag(np.asarray(full)), atol=1e-5)


def test_giou_known_values():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    # identical boxes -> giou 1; disjoint distant boxes -> giou < 0
    g = generalized_box_iou_pairwise(a, a)
    np.testing.assert_allclose(g, [[1.0]], atol=1e-6)
    far = jnp.asarray([[10.0, 0.0, 12.0, 2.0]])
    g2 = generalized_box_iou_pairwise(a, far)
    # enclosing box is [0,0,12,2]: area 24, union 8 -> giou = 0 - 16/24
    np.testing.assert_allclose(g2, [[-16.0 / 24.0]], atol=1e-6)


def _numpy_giou(a, b):
    """Independent numpy re-derivation of pairwise GIoU."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    iou = inter / union
    lt2 = np.minimum(a[:, None, :2], b[None, :, :2])
    rb2 = np.maximum(a[:, None, 2:], b[None, :, 2:])
    wh2 = np.clip(rb2 - lt2, 0, None)
    hull = wh2[..., 0] * wh2[..., 1]
    return iou - (hull - union) / hull


def test_giou_vs_numpy_formula():
    rng = np.random.default_rng(2)
    a, b = _rand_xyxy(rng, 8), _rand_xyxy(rng, 11)
    ours = np.asarray(
        generalized_box_iou_pairwise(jnp.asarray(a), jnp.asarray(b))
    )
    np.testing.assert_allclose(ours, _numpy_giou(a, b), atol=1e-5)


def test_clip_boxes():
    b = jnp.asarray([[-5.0, -5.0, 700.0, 300.0]])
    out = clip_boxes(b, 256, 640)
    np.testing.assert_allclose(out, [[0.0, 0.0, 640.0, 256.0]])
