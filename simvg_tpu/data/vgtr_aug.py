"""VGTR legacy augmentation suite (reference
simvg/datasets/pipelines/vgtr_aug.py:16-62 VGTRAugment + helpers:
reshape:64-81, horizontal_flip:83-94, random_affine:96-221,
colorjitter:258-264, gauss:266-272).

Unused by every shipped SimVG config (SeqTR/VGTR era), kept for parity
of the PIPELINES registry surface.  Host-side cv2/numpy, same semantic
chain as the reference:

    HSV S/V jitter -> color jitter -> optional gaussian blur
    -> letterbox to a square canvas -> random affine (rotate/scale/
    translate, boxes warped through the matrix) -> 50% horizontal flip
    with "left"/"right" swapped in the expression.

Deviation (deliberate): the reference draws from the process-global
``random`` module; here the sample's deterministic ``aug_rng`` stream
is used when present (thread-order independent), falling back to a
module default — the same policy as LargeScaleJitter.
"""

from __future__ import annotations

import math
import random as _random

import cv2
import numpy as np

_FILL = (123.7, 116.3, 103.5)


def _hsv_jitter(img: np.ndarray, rng) -> np.ndarray:
    """Saturation/value jitter in HSV (vgtr_aug.py:32-45)."""
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
    for c in (1, 2):
        a = (rng.random() * 2 - 1) * 0.5 + 1
        hsv[:, :, c] = np.clip(hsv[:, :, c] * a, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def _color_jitter(img: np.ndarray, rng) -> np.ndarray:
    """Brightness/contrast jitter (torchvision ColorJitter role,
    vgtr_aug.py:258-264) without the torchvision dependency."""
    b = 1 + (rng.random() * 2 - 1) * 0.25
    c = 1 + (rng.random() * 2 - 1) * 0.25
    out = img.astype(np.float32) * b
    mean = out.mean(axis=(0, 1), keepdims=True)
    out = (out - mean) * c + mean
    return np.clip(out, 0, 255).astype(np.uint8)


def _gauss(img: np.ndarray, rng) -> np.ndarray:
    """50% 3x3 gaussian blur (vgtr_aug.py:266-272)."""
    if rng.random() > 0.5:
        sigma = 0.3 * ((3 - 1) * 0.5 - 1) + 0.8
        img = cv2.GaussianBlur(img, (3, 3), sigma)
    return img


def _letterbox(img: np.ndarray, bbox: np.ndarray, size: int):
    """Keep-ratio resize + center pad to a square canvas
    (reshape, vgtr_aug.py:64-81)."""
    h, w = img.shape[:2]
    ratio = float(size) / max(h, w)
    new_w, new_h = round(w * ratio), round(h * ratio)
    dw, dh = (size - new_w) / 2, (size - new_h) / 2
    img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_AREA)
    top, bottom = round(dh - 0.1), round(dh + 0.1)
    left, right = round(dw - 0.1), round(dw + 0.1)
    img = cv2.copyMakeBorder(img, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=_FILL)
    bbox = bbox.copy()
    bbox[0::2] = bbox[0::2] * ratio + dw
    bbox[1::2] = bbox[1::2] * ratio + dh
    return img, bbox


def _random_affine(img: np.ndarray, bbox: np.ndarray, rng,
                   degrees=(-15, 15), translate=(0.15, 0.15),
                   scale=(0.75, 1.25)):
    """Rotate/scale/translate; box corners warped through the matrix
    and re-boxed (random_affine + wrap_points, vgtr_aug.py:96-221,
    276-315)."""
    size = img.shape[0]
    a = rng.random() * (degrees[1] - degrees[0]) + degrees[0]
    s = rng.random() * (scale[1] - scale[0]) + scale[0]
    rot = np.eye(3)
    rot[:2] = cv2.getRotationMatrix2D(
        (size / 2, size / 2), a, s)
    trans = np.eye(3)
    trans[0, 2] = (rng.random() * 2 - 1) * translate[0] * size
    trans[1, 2] = (rng.random() * 2 - 1) * translate[1] * size
    m = trans @ rot
    img = cv2.warpAffine(img, m[:2], (size, size),
                         flags=cv2.INTER_LINEAR, borderValue=_FILL)
    # warp the 4 box corners, re-axis-align
    x0, y0, x1, y1 = bbox[:4]
    corners = np.asarray([[x0, y0, 1], [x1, y1, 1],
                          [x0, y1, 1], [x1, y0, 1]], np.float64)
    warped = corners @ m.T
    nb = np.asarray([warped[:, 0].min(), warped[:, 1].min(),
                     warped[:, 0].max(), warped[:, 1].max()])
    nb[0::2] = np.clip(nb[0::2], 0, size - 1)
    nb[1::2] = np.clip(nb[1::2], 0, size - 1)
    return img, nb


def _horizontal_flip(img, phrase, bbox, rng):
    """50% flip; "left"/"right" swapped in the expression
    (vgtr_aug.py:83-94)."""
    if rng.random() <= 0.5:
        return img, phrase, bbox
    w = img.shape[1]
    img = cv2.flip(img, 1)
    bbox = bbox.copy()
    bbox[0], bbox[2] = w - bbox[2] - 1, w - bbox[0] - 1
    phrase = (phrase.replace("right", "*&^special^&*")
              .replace("left", "right")
              .replace("*&^special^&*", "left"))
    return img, phrase, bbox


class VGTRAugment:
    """The composed legacy pipeline op (vgtr_aug.py:16-62)."""

    def __init__(self, img_size: int = 512):
        self.img_size = img_size

    def __call__(self, s: dict) -> dict:
        rng = s.get("aug_rng") or _random
        img = s["img"]
        phrase = s["expression"]
        bbox = np.asarray(s["gt_bbox"], np.float64).reshape(-1)[:4]

        img = _hsv_jitter(img, rng)
        img = _color_jitter(img, rng)
        img = _gauss(img, rng)
        img, bbox = _letterbox(img, bbox, self.img_size)
        img, bbox = _random_affine(img, bbox, rng)
        img, phrase, bbox = _horizontal_flip(img, phrase, bbox, rng)

        s["img"] = img
        s["expression"] = phrase
        s["gt_bbox"] = bbox
        s["img_shape"] = img.shape
        s["pad_shape"] = img.shape
        # scale_factor left untouched: after letterbox + random affine
        # + flip the mapping to original coordinates is not a per-axis
        # scale (the reference's VGTRAugment likewise sets none —
        # vgtr_aug.py:20-28); this legacy train-only aug does not
        # support rescale-to-original.
        return s
