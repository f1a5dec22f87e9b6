"""Host-side image transforms (numpy/cv2).

Same observable behaviour as the reference pipeline ops
(simvg/datasets/pipelines/transforms.py) without mmcv: cv2 bilinear
resize, (img-mean)/std normalisation with BGR->RGB, pad-to-divisor /
fixed / square, and LargeScaleJitter (random rescale in
[jitter_min, jitter_max] with an IoU-constrained crop when upscaled).

A sample is a plain dict flowing through callables; keys mirror the
reference's result dict: img (HWC, BGR uint8 from cv2), ori_shape,
img_shape, pad_shape, scale_factor, gt_bbox (xyxy float, [4] or [N,4]
for GRefCOCO), with_bbox, expression, ref_expr_inds,
text_attention_mask, ...
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import cv2
import numpy as np


def _rescale_size(w: int, h: int, scale: float) -> Tuple[int, int]:
    """mmcv rescale_size rounding: int(dim * scale + 0.5)."""
    return int(w * scale + 0.5), int(h * scale + 0.5)


def _imrescale(img: np.ndarray, scale: float) -> np.ndarray:
    h, w = img.shape[:2]
    nw, nh = _rescale_size(w, h, scale)
    return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)


def _rescale_to_max(img: np.ndarray, max_size: int) -> np.ndarray:
    h, w = img.shape[:2]
    scale = max_size / max(h, w)
    return _imrescale(img, scale)


def _resize_mask(s: dict, wh) -> None:
    """Resize the GT bitmap mask (nearest; binary) and refresh its RLE
    (the reference re-encodes after every geometric op,
    transforms.py:99, 204)."""
    from simvg_tpu.ops import rle as rle_ops

    m = cv2.resize(s["gt_mask"], wh, interpolation=cv2.INTER_NEAREST)
    s["gt_mask"] = m
    s["gt_mask_rle"] = rle_ops.encode(m)


class Resize:
    """Resize image + boxes (transforms.py:9-122).  ``img_scale`` is
    (w, h); keep_ratio rescales the long side."""

    def __init__(self, img_scale: Tuple[int, int], keep_ratio: bool = False):
        self.img_scale = img_scale
        self.keep_ratio = keep_ratio

    def __call__(self, s: dict) -> dict:
        img = s["img"]
        if self.keep_ratio:
            # reference quirk kept: the keep_ratio branch computes the
            # box scale against ORI_SHAPE (transforms.py:67-70), valid
            # because no shipped pipeline puts an op that changes the
            # image size before a keep_ratio Resize.
            h, w = s["ori_shape"][:2]
            scale = min(self.img_scale[0] / w, self.img_scale[1] / h)
            new_w, new_h = _rescale_size(w, h, scale)
        else:
            # box scale relative to the CURRENT image (mmcv.imresize
            # return_scale semantics, transforms.py:72-75): boxes are in
            # current-image coordinates when an earlier op (e.g.
            # LargeScaleJitter) already changed the size.
            h, w = img.shape[:2]
            new_w, new_h = self.img_scale
        img = cv2.resize(img, (new_w, new_h),
                         interpolation=cv2.INTER_LINEAR)
        w_scale, h_scale = new_w / w, new_h / h
        sf = np.asarray([w_scale, h_scale, w_scale, h_scale], np.float32)
        s["img"] = img
        s["img_shape"] = img.shape
        s["pad_shape"] = img.shape
        s["scale_factor"] = sf
        if s.get("with_bbox"):
            gb = s["gt_bbox"]
            if isinstance(gb, list):
                s["gt_bbox"] = [b * sf for b in gb]
            else:
                s["gt_bbox"] = gb * sf
        if s.get("with_mask") and "gt_mask" in s:
            _resize_mask(s, (new_w, new_h))
        return s


class Normalize:
    """(img - mean) / std with BGR->RGB first (transforms.py:125-156)."""

    def __init__(self, mean: Sequence[float], std: Sequence[float],
                 to_rgb: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, s: dict) -> dict:
        img = s["img"].astype(np.float32)
        if self.to_rgb:
            img = img[..., ::-1]
        s["img"] = (img - self.mean) / self.std
        s["img_norm_cfg"] = dict(mean=self.mean, std=self.std,
                                 to_rgb=self.to_rgb)
        return s


class Pad:
    """Bottom/right zero padding (transforms.py:159-223)."""

    def __init__(self, size: Optional[Tuple[int, int]] = None,
                 size_divisor: Optional[int] = None,
                 pad_to_square: bool = False,
                 pad_to_square_size: Tuple[int, int] = (640, 640),
                 pad_val: float = 0.0):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_to_square = pad_to_square
        self.pad_to_square_size = pad_to_square_size
        self.pad_val = pad_val

    def __call__(self, s: dict) -> dict:
        img = s["img"]
        h, w = img.shape[:2]
        if self.pad_to_square:
            th, tw = self.pad_to_square_size
        elif self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th, tw = ((h + d - 1) // d) * d, ((w + d - 1) // d) * d
        out = np.full((th, tw) + img.shape[2:], self.pad_val, img.dtype)
        out[:h, :w] = img
        s["img"] = out
        s["pad_shape"] = out.shape
        if s.get("with_mask") and "gt_mask" in s:
            from simvg_tpu.ops import rle as rle_ops

            m = np.zeros((th, tw), s["gt_mask"].dtype)
            m[:h, :w] = s["gt_mask"]
            s["gt_mask"] = m
            s["gt_mask_rle"] = rle_ops.encode(m)
        return s


class LargeScaleJitter:
    """Scale jitter in [jitter_min, jitter_max] of the keep-ratio fit to
    out_max_size; when upscaled (>1.0), take an IoU-constrained random
    crop of the fit size (transforms.py:226-342).

    Uses a local random.Random so per-worker seeding is deterministic.
    """

    def __init__(self, out_max_size: int = 640, jitter_min: float = 0.3,
                 jitter_max: float = 1.4, min_iou_thr: float = 0.3,
                 crop_iou_thr: Sequence[float] = (0.5, 0.6, 0.7, 0.8, 0.9),
                 jitter_times: int = 100,
                 rng: Optional[random.Random] = None):
        self.out_max_size = out_max_size
        self.jitter_min = jitter_min
        self.jitter_max = jitter_max
        self.min_iou_thr = min_iou_thr
        self.crop_iou_thr = tuple(crop_iou_thr)
        self.jitter_times = jitter_times
        self.rng = rng or random

    @staticmethod
    def _crop_cover(crop: np.ndarray, gt: np.ndarray) -> float:
        """Fraction of gt covered by crop (transforms.py:238-244).

        Deviation: gaps are clamped at 0. The reference multiplies the
        raw (possibly negative) gaps, so a crop DIAGONALLY disjoint
        from the box scores (neg*neg) > 0 and can be accepted, cropping
        the referred object out entirely; clamping keeps the coverage
        semantics it clearly intended."""
        lt = np.maximum(crop[:2], gt[:2])
        rb = np.minimum(crop[2:], gt[2:])
        wh = np.maximum(rb - lt, 0.0)
        overlap = wh[0] * wh[1]
        area = (gt[2] - gt[0]) * (gt[3] - gt[1])
        return float(overlap / max(area, 1e-12))

    @staticmethod
    def _mask_cover(crop: np.ndarray, gt_mask: np.ndarray) -> float:
        """Fraction of the mask's area inside the crop rectangle —
        the mask-only (with_bbox=False) crop-acceptance criterion
        (reference _mask_overlaps, transforms.py:246-252)."""
        x0, y0, x1, y1 = np.maximum(crop, 0.0).astype(np.int64)
        inside = float(gt_mask[y0:y1, x0:x1].sum())
        return inside / max(float(gt_mask.sum()), 1e-12)

    def __call__(self, s: dict) -> dict:
        img = s["img"]
        h, w = s["ori_shape"][:2]
        # per-sample deterministic stream when the dataset provides one
        # (thread-order independent); else the instance/global RNG
        rng = s.get("aug_rng") or self.rng
        rand_scale = (self.jitter_min + rng.random()
                      * (self.jitter_max - self.jitter_min))
        fit_scale = self.out_max_size / max(h, w)
        img = _imrescale(img, rand_scale * fit_scale)
        new_h, new_w = img.shape[:2]
        if s.get("with_mask") and "gt_mask" in s:
            s["gt_mask"] = cv2.resize(s["gt_mask"], (new_w, new_h),
                                      interpolation=cv2.INTER_NEAREST)

        gt_bbox = s.get("gt_bbox")
        multi = isinstance(gt_bbox, list)
        factor = np.asarray(
            [new_w / w, new_h / h, new_w / w, new_h / h], np.float64
        )
        if s.get("with_bbox"):
            if multi:
                gt_bbox = [b * factor for b in gt_bbox]
            else:
                gt_bbox = gt_bbox * factor

        if rand_scale > 1.0:
            w_out, h_out = _rescale_size(w, h, fit_scale)
            # crop-acceptance criterion (reference transforms.py:288-291):
            # bbox coverage when boxes exist, else mask coverage; a
            # GRefCOCO no-target sample (empty bbox list) has nothing to
            # keep — any crop is acceptable (full-image reference box)
            use_mask = (not s.get("with_bbox") and s.get("with_mask")
                        and "gt_mask" in s)
            if use_mask:
                ref_box = None
            elif multi and len(gt_bbox) == 0:
                ref_box = np.asarray([0.0, 0.0, new_w, new_h])
            else:
                ref_box = gt_bbox[0] if multi else gt_bbox
            flag, best_idx, best_iou, history = False, -1, 0.0, []
            offset = (0.0, 0.0)
            for i, iou_thr in enumerate(self.crop_iou_thr[::-1]):
                if flag:
                    break
                for it in range(self.jitter_times):
                    offset = (rng.random() * (new_w - w_out),
                              rng.random() * (new_h - h_out))
                    crop = np.asarray(
                        [offset[0], offset[1], offset[0] + w_out,
                         offset[1] + h_out]
                    )
                    iou = (self._mask_cover(crop, s["gt_mask"])
                           if use_mask
                           else self._crop_cover(crop, ref_box))
                    history.append((crop, offset))
                    if iou > best_iou:
                        best_iou = iou
                        best_idx = len(history) - 1
                    if iou >= iou_thr:
                        flag = True
                        break
            if not flag:
                if best_iou < self.min_iou_thr:
                    # give up: rand_scale > 1 means the image long side
                    # is rand_scale*out_max_size, which the downstream
                    # Pad/collate canvas cannot hold — rescale back to
                    # the keep-ratio fit (<= out_max_size), like the
                    # reference's escape path keeps the fitted image
                    img = cv2.resize(img, (w_out, h_out),
                                     interpolation=cv2.INTER_LINEAR)
                    if s.get("with_mask") and "gt_mask" in s:
                        s["gt_mask"] = cv2.resize(
                            s["gt_mask"], (w_out, h_out),
                            interpolation=cv2.INTER_NEAREST)
                        from simvg_tpu.ops import rle as rle_ops

                        s["gt_mask_rle"] = rle_ops.encode(s["gt_mask"])
                    back = np.asarray(
                        [w_out / new_w, h_out / new_h,
                         w_out / new_w, h_out / new_h], np.float64)
                    if s.get("with_bbox"):
                        if multi:
                            gt_bbox = [b * back for b in gt_bbox]
                        else:
                            gt_bbox = gt_bbox * back
                        s["gt_bbox"] = self._clip(gt_bbox, w_out, h_out,
                                                  multi)
                    s["img"] = img
                    s["img_shape"] = img.shape
                    s["pad_shape"] = img.shape
                    s["scale_factor"] = np.asarray(
                        [w_out / w, h_out / h, w_out / w, h_out / h],
                        np.float32)
                    return s
                crop, offset = history[best_idx]
            crop = crop.astype(np.uint32)
            img = img[crop[1]:crop[3], crop[0]:crop[2]]
            if s.get("with_mask") and "gt_mask" in s:
                s["gt_mask"] = s["gt_mask"][crop[1]:crop[3],
                                            crop[0]:crop[2]]
            new_h, new_w = img.shape[:2]
            shift = np.asarray(
                [offset[0], offset[1], offset[0], offset[1]]
            )
            if s.get("with_bbox"):
                if multi:
                    gt_bbox = [b - shift for b in gt_bbox]
                else:
                    gt_bbox = gt_bbox - shift

        if s.get("with_bbox"):
            s["gt_bbox"] = self._clip(gt_bbox, new_w, new_h, multi)
        if s.get("with_mask") and "gt_mask" in s:
            from simvg_tpu.ops import rle as rle_ops

            s["gt_mask_rle"] = rle_ops.encode(s["gt_mask"])
        s["img"] = img
        s["img_shape"] = img.shape
        s["pad_shape"] = img.shape
        s["scale_factor"] = np.asarray(
            [new_w / w, new_h / h, new_w / w, new_h / h], np.float32
        )
        return s

    @staticmethod
    def _clip(gt_bbox, w, h, multi):
        def clip_one(b):
            b = b.copy()
            b[0::2] = np.clip(b[0::2], 0, w - 1)
            b[1::2] = np.clip(b[1::2], 0, h - 1)
            return b

        return [clip_one(b) for b in gt_bbox] if multi else clip_one(
            gt_bbox
        )


class SampleMaskVertices:
    """SeqTR-legacy contour vertex sampler (pipelines/mask.py:7-101):
    mass center of the largest mask contour plus num_ray sampled contour
    points, output [2, num_ray] padded with -1. With center_sampling and
    the center inside the contour, points are the farthest contour hits
    at evenly spaced ray angles (with +-5 degree fallback); otherwise an
    even stride over the contour."""

    def __init__(self, center_sampling: bool = False, num_ray: int = 18):
        assert num_ray > 0
        self.center_sampling = center_sampling
        self.num_ray = num_ray

    def __call__(self, s: dict) -> dict:
        assert s.get("with_mask"), "SampleMaskVertices needs with_mask"
        mask = np.ascontiguousarray(s["gt_mask"], np.uint8)
        center, contour, keep = self._mass_center(mask)
        s["gt_mask_vertices"] = self._sample(
            center, contour, keep, s.get("pad_shape", mask.shape)[:2])
        s["mass_center"] = center
        return s

    def _mass_center(self, mask):
        contours, _ = cv2.findContours(mask, cv2.RETR_TREE,
                                       cv2.CHAIN_APPROX_NONE)
        if not contours:
            return np.asarray([-1.0, -1.0]), np.zeros((0, 2)), False
        contour = max(contours, key=cv2.contourArea)[:, 0, :]
        m = cv2.moments(contour)
        if m["m00"] > 0.0:
            return (np.asarray([m["m10"] / m["m00"],
                                m["m01"] / m["m00"]]), contour, True)
        return np.asarray([-1.0, -1.0]), contour, False

    def _sample(self, center, contour, keep, max_shape):
        verts = np.full((2, self.num_ray), -1, np.float32)
        if not keep:
            return verts
        n = contour.shape[0]
        if n <= self.num_ray:
            verts[:, :n] = contour.T
            return verts
        inside = cv2.pointPolygonTest(
            contour, tuple(float(c) for c in center), False) > 0
        if self.center_sampling and inside:
            dx = contour[:, 0] - center[0]
            dy = contour[:, 1] - center[1]
            ang = np.arctan2(dy, dx) * 180 / np.pi
            ang[ang < 0] += 360
            ang = ang.astype(np.uint32)
            dist = np.sqrt(dx ** 2 + dy ** 2)
            hit_ang, hit_dist = [], []
            # exactly num_ray evenly spaced rays (range(0,360,360//n)
            # would emit an EXTRA ray when n doesn't divide 360)
            ray_angles = (np.linspace(0, 360, self.num_ray,
                                      endpoint=False)
                          .astype(np.int64))
            for a in ray_angles:
                for inc in (0, 1, -1, 2, -2, 3, -3, 4, -4, 5, -5):
                    aa = a + inc
                    if (ang == aa).any():
                        hit_ang.append(aa)
                        hit_dist.append(dist[ang == aa].max())
                        break
            rad = np.asarray(hit_ang) / 180 * np.pi
            vx = center[0] + np.asarray(hit_dist) * np.cos(rad)
            vy = center[1] + np.asarray(hit_dist) * np.sin(rad)
        else:
            import math

            stride = math.ceil(n / self.num_ray)
            vx = contour[::stride, 0]
            vy = contour[::stride, 1]
        if max_shape is not None:
            vx = np.clip(vx, 0, max_shape[1] - 1)
            vy = np.clip(vy, 0, max_shape[0] - 1)
        pts = np.vstack((vx, vy)).astype(np.float32)
        verts[:, :pts.shape[1]] = pts
        return verts


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, s: dict) -> dict:
        for t in self.transforms:
            s = t(s)
        return s
