"""Legacy parity components: VGTRAugment pipeline op, LabelSmoothCE,
BoxLoss (reference vgtr_aug.py / core/losses/label_smooth.py /
models/losses/boxloss.py — unused by shipped configs, kept for registry
surface)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simvg_tpu.data.vgtr_aug import VGTRAugment
from simvg_tpu.losses.legacy import box_loss, label_smooth_ce


def _sample(seed=0, h=100, w=140):
    import cv2

    img = np.full((h, w, 3), 128, np.uint8)
    x, y, bw, bh = 30, 25, 50, 40
    cv2.rectangle(img, (x, y), (x + bw, y + bh), (0, 255, 0), -1)
    return {
        "img": img,
        "ori_shape": img.shape,
        "img_shape": img.shape,
        "pad_shape": img.shape,
        "scale_factor": np.ones(4, np.float32),
        "with_bbox": True,
        "with_mask": False,
        "expression": "the box on the left side",
        "gt_bbox": np.asarray([x, y, x + bw, y + bh], np.float64),
        "aug_rng": random.Random(seed),
    }


def test_vgtr_augment_geometry_and_phrase():
    for seed in range(12):
        s = _sample(seed)
        out = VGTRAugment(img_size=96)(s)
        assert out["img"].shape == (96, 96, 3)
        bb = np.asarray(out["gt_bbox"])
        assert bb.shape[-1] == 4
        assert (bb[0] <= bb[2]) and (bb[1] <= bb[3]), bb
        assert bb.min() >= 0 and bb.max() <= 95
        # phrase keeps its word count; left/right may be swapped
        assert len(out["expression"].split()) == 6


def test_vgtr_flip_swaps_left_right():
    # find a seed whose draw flips, then assert the phrase swap
    for seed in range(30):
        s = _sample(seed)
        out = VGTRAugment(img_size=96)(s)
        if "right" in out["expression"]:
            assert "left" not in out["expression"]
            return
    pytest.fail("no flip in 30 seeds")


def test_label_smooth_ce_matches_manual():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 3, 4)), jnp.float32)
    tgt = jnp.asarray([[0, 1, 2], [3, 0, 1]])
    got = float(label_smooth_ce(logits, tgt, neg_factor=0.1))
    # manual: smoothed one-hot, mean over B*N
    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1)).reshape(-1, 4)
    oh = np.full((6, 4), 0.1 / 4)
    oh[np.arange(6), np.asarray(tgt).reshape(-1)] = 0.9
    want = float((-np.sum(lp * oh, axis=1)).sum() / 6)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # differentiable
    g = jax.grad(lambda x: label_smooth_ce(x, tgt))(logits)
    assert bool(jnp.isfinite(g).all())


def test_box_loss_perfect_and_weights():
    p = jnp.asarray([[0.5, 0.5, 0.2, 0.3]], jnp.float32)
    total, l1, giou = box_loss(p, p)
    np.testing.assert_allclose(float(total), 0.0, atol=1e-6)
    g = jnp.asarray([[0.6, 0.5, 0.2, 0.3]], jnp.float32)
    total, l1, giou = box_loss(p, g)
    # l1 term = 5 * |0.1|
    np.testing.assert_allclose(float(l1), 0.5, rtol=1e-5)
    assert float(giou) > 0
