"""Regression: LargeScaleJitter -> Resize(keep_ratio=False) must keep
boxes aligned with image content.

Resize previously scaled boxes by new/ORI_SHAPE while resizing the
CURRENT (LSJ-modified) image — after LSJ every train sample's gt_bbox
was off by the jitter factor (the reference's mmcv.imresize
return_scale computes new/current, transforms.py:72-75). This corrupted
ALL training supervision in any pipeline with LargeScaleJitter (val
reads clean data -> train acc climbs on memorization while val stays at
0)."""

import random

import cv2
import numpy as np

from simvg_tpu.data.transforms import (
    Compose,
    LargeScaleJitter,
    Normalize,
    Resize,
)


def _green_iou(sample):
    """IoU of the green rectangle's pixel extent vs gt_bbox."""
    img = sample["img"]
    mean = np.asarray([123.675, 116.28, 103.53])
    std = np.asarray([58.395, 57.12, 57.375])
    raw = img * std + mean
    g = (raw[:, :, 1] > 200) & (raw[:, :, 0] < 80) & (raw[:, :, 2] < 80)
    ys, xs = np.nonzero(g)
    assert len(xs) >= 4, "green box vanished"
    x0, x1, y0, y1 = xs.min(), xs.max(), ys.min(), ys.max()
    bb = np.asarray(sample["gt_bbox"]).reshape(-1)[:4]
    ix0, iy0 = max(x0, bb[0]), max(y0, bb[1])
    ix1, iy1 = min(x1, bb[2]), min(y1, bb[3])
    inter = max(0.0, ix1 - ix0) * max(0.0, iy1 - iy0)
    a1 = (x1 - x0) * (y1 - y0)
    a2 = (bb[2] - bb[0]) * (bb[3] - bb[1])
    return inter / max(a1 + a2 - inter, 1e-6)


def _sample(rng, h=120, w=160):
    # flat gray background: noise backgrounds produce false-positive
    # "green" pixels after interpolated downscaling
    img = np.full((h, w, 3), 128, np.uint8)
    x, y = int(rng.integers(5, w // 2)), int(rng.integers(5, h // 2))
    bw, bh = int(rng.integers(20, w // 2)), int(rng.integers(20, h // 2))
    # BGR green (Normalize flips to RGB)
    cv2.rectangle(img, (x, y), (x + bw, y + bh), (0, 255, 0), -1)
    return {
        "img": img,
        "ori_shape": img.shape,
        "img_shape": img.shape,
        "pad_shape": img.shape,
        "scale_factor": np.ones(4, np.float32),
        "with_bbox": True,
        "with_mask": False,
        "gt_bbox": np.asarray([x, y, x + bw, y + bh], np.float64),
    }


def test_lsj_then_resize_keeps_boxes_on_content():
    pipe = Compose([
        LargeScaleJitter(out_max_size=64, jitter_min=0.3, jitter_max=1.4),
        Resize(img_scale=(64, 64), keep_ratio=False),
        Normalize(mean=[123.675, 116.28, 103.53],
                  std=[58.395, 57.12, 57.375]),
    ])
    rng = np.random.default_rng(0)
    for i in range(40):
        s = _sample(rng)
        s["aug_rng"] = random.Random(i)
        out = pipe(s)
        assert out["img"].shape[:2] == (64, 64)
        iou = _green_iou(out)
        assert iou >= 0.5, (i, iou, out["gt_bbox"])


def test_resize_alone_unchanged_semantics():
    """Without a size-changing op before it, Resize behaves as before
    (new/ori == new/current) — val pipelines are unaffected."""
    rng = np.random.default_rng(1)
    s = _sample(rng)
    out = Resize(img_scale=(64, 64), keep_ratio=False)(dict(s))
    np.testing.assert_allclose(
        out["scale_factor"], [64 / 160, 64 / 120] * 2, rtol=1e-6)
    np.testing.assert_allclose(
        out["gt_bbox"],
        s["gt_bbox"] * np.asarray([64 / 160, 64 / 120] * 2), rtol=1e-6)


def test_lsj_mask_only_crop_criterion():
    """with_bbox=False + with_mask=True (the segmentation config
    family's default): LSJ must use the MASK-coverage crop criterion
    (reference transforms.py:288-291) instead of crashing on a None
    gt_bbox (round-3 review finding)."""
    rng = np.random.default_rng(2)
    for i in range(30):
        s = _sample(rng)
        x0, y0, x1, y1 = s.pop("gt_bbox").astype(int)
        s["with_bbox"] = False
        s["with_mask"] = True
        gm = np.zeros(s["img"].shape[:2], np.uint8)
        gm[y0:y1, x0:x1] = 1
        s["gt_mask"] = gm
        s["aug_rng"] = random.Random(i)
        out = LargeScaleJitter(out_max_size=64, jitter_min=0.3,
                               jitter_max=1.4)(s)
        assert out["gt_mask"].shape == out["img"].shape[:2]
        # the accepted crop keeps a meaningful part of the mask (the
        # escape path keeps everything)
        assert out["gt_mask"].sum() > 0


def test_lsj_grec_empty_target_list():
    """A GRefCOCO no-target sample (empty bbox list) must pass through
    LSJ without IndexError — there is nothing to keep, any crop is
    acceptable (round-3 review finding)."""
    rng = np.random.default_rng(3)
    for i in range(20):
        s = _sample(rng)
        s["gt_bbox"] = []  # multi-target schema, zero targets
        s["aug_rng"] = random.Random(i)
        out = LargeScaleJitter(out_max_size=64, jitter_min=0.3,
                               jitter_max=1.4)(s)
        assert out["gt_bbox"] == []
        assert max(out["img"].shape[:2]) <= 64
