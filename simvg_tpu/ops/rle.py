"""COCO run-length-encoded mask operations.

pycocotools is unavailable in this environment; the reference uses its
C ``maskUtils`` for mask GT processing and the mask-IoU metric
(simvg/datasets/pipelines/loading.py:241-262, simvg/apis/test.py:13-27).
This module reimplements the needed subset:

- ``encode``/``decode`` of COCO's compressed RLE string format
  (column-major/Fortran order, LEB128-style base-6 varint with sign
  folding, exactly compatible with pycocotools);
- ``frPyObjects``/``merge`` for polygon -> RLE ground truth;
- ``iou`` for aligned mask IoU at eval.

A C++ fast path (simvg_tpu/native/_rle.so, built by
simvg_tpu/native/build.py) accelerates decode/encode of large masks;
the numpy implementation is the always-available fallback and the
reference for its tests.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np

RLE = Dict[str, Union[bytes, str, Sequence[int]]]


def _native():
    from simvg_tpu.native import get_rle_ext

    return get_rle_ext()


# ----------------------------------------------------------- counts codec

def _encode_counts(counts: np.ndarray) -> bytes:
    """COCO compressed RLE: difference-coded base-6 varint (chars
    0x30 + 6 bits/char, continuation in bit 5)."""
    out = bytearray()
    counts = np.asarray(counts, np.int64)
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            bits = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (bits & 0x10))
                        or (x == -1 and (bits & 0x10)))
            if more:
                bits |= 0x20
            out.append(bits + 48)
    return bytes(out)


def _decode_counts(s: bytes) -> np.ndarray:
    counts: List[int] = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.int64)


# --------------------------------------------------------------- public

def encode(mask: np.ndarray) -> RLE:
    """Binary mask [H, W] (any int/bool dtype) -> compressed RLE dict."""
    h, w = mask.shape
    ext = _native()
    if ext is not None and mask.size:
        flat = np.ascontiguousarray(
            np.asfortranarray(mask).reshape(-1, order="F").astype(np.uint8)
        )
        runs = ext.runs_from_mask(flat.tobytes())
        return {"size": [int(h), int(w)],
                "counts": ext.encode_counts(runs)}
    flat = np.asfortranarray(mask).reshape(-1, order="F").astype(bool)
    # run lengths, starting with a (possibly zero) run of 0s
    changes = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    boundaries = np.concatenate([[0], changes, [flat.size]])
    runs = np.diff(boundaries)
    if flat.size and flat[0]:
        runs = np.concatenate([[0], runs])
    if flat.size == 0:
        runs = np.asarray([0], np.int64)
    return {"size": [int(h), int(w)],
            "counts": _encode_counts(runs)}


def decode(rle: RLE) -> np.ndarray:
    """Compressed (bytes/str counts) or uncompressed (list counts) RLE
    -> uint8 mask [H, W]."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = counts.encode()
    ext = _native()
    if isinstance(counts, (bytes, bytearray)):
        if ext is not None:
            runs = ext.decode_counts(bytes(counts))
        else:
            runs = _decode_counts(bytes(counts))
    else:
        runs = np.asarray(counts, np.int64)
    if ext is not None:
        flat = np.frombuffer(
            ext.mask_from_runs([int(r) for r in runs], h * w), np.uint8
        )
    else:
        vals = np.zeros(len(runs), np.uint8)
        vals[1::2] = 1
        flat = np.repeat(vals, runs)
    assert flat.size == h * w, (flat.size, h, w)
    return flat.reshape((h, w), order="F")


def area(rle: RLE) -> int:
    return int(decode(rle).sum())


def merge(rles: List[RLE]) -> RLE:
    """Union of masks (the reference merges multi-part polygons,
    loading.py:248-252)."""
    out = decode(rles[0])
    for r in rles[1:]:
        out = np.logical_or(out, decode(r))
    return encode(out.astype(np.uint8))


def frPyObjects(polys, h: int, w: int) -> List[RLE]:
    """Polygons [[x0, y0, x1, y1, ...], ...] -> RLEs via rasterisation."""
    import cv2

    out = []
    for p in polys:
        pts = np.asarray(p, np.float64).reshape(-1, 2)
        mask = np.zeros((h, w), np.uint8)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
        out.append(encode(mask))
    return out


def iou(dt: List[RLE], gt: List[RLE], iscrowd=None) -> np.ndarray:
    """Pairwise mask IoU [len(dt), len(gt)] (maskUtils.iou semantics;
    iscrowd ignores the union term for crowd GT)."""
    if iscrowd is None:
        iscrowd = [0] * len(gt)
    out = np.zeros((len(dt), len(gt)))
    dts = [decode(d).astype(bool) for d in dt]
    gts = [decode(g).astype(bool) for g in gt]
    for i, d in enumerate(dts):
        for j, g in enumerate(gts):
            inter = np.logical_and(d, g).sum()
            if iscrowd[j]:
                denom = d.sum()
            else:
                denom = np.logical_or(d, g).sum()
            out[i, j] = inter / denom if denom else 0.0
    return out
