"""Prediction visualisation (simvg/core/utils.py:34-130 equivalent):
draw predicted (red) and ground-truth (blue) boxes on the image."""

from __future__ import annotations

from typing import Optional

import cv2
import numpy as np

PRED_COLOR = (0, 0, 255)  # red in BGR
GT_COLOR = (255, 0, 0)  # blue in BGR


def imshow_expr_bbox(img_bgr: np.ndarray, pred_bbox, out_file: str,
                     gt_bbox=None, thickness: int = 2,
                     expression: Optional[str] = None) -> np.ndarray:
    img = np.ascontiguousarray(img_bgr.copy())

    def draw(box, color):
        box = np.asarray(box, np.float64).reshape(-1, 4)
        for b in box:
            cv2.rectangle(img, (int(b[0]), int(b[1])),
                          (int(b[2]), int(b[3])), color, thickness)

    draw(pred_bbox, PRED_COLOR)
    if gt_bbox is not None:
        draw(gt_bbox, GT_COLOR)
    if expression:
        cv2.putText(img, expression[:60], (4, 16),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.45, (255, 255, 255), 1)
    if out_file:
        cv2.imwrite(out_file, img)
    return img


def imshow_expr_mask(img_bgr: np.ndarray, pred_mask_rle, out_file: str,
                     gt_mask_rle=None, alpha: float = 0.45) -> np.ndarray:
    """Overlay predicted (red) / GT (blue) segmentation masks
    (imshow_expr_mask, simvg/core/utils.py mask path).  Masks are COCO
    RLE dicts (simvg_tpu.ops.rle)."""
    from simvg_tpu.ops import rle as rle_ops

    img = np.ascontiguousarray(img_bgr.copy())

    def overlay(r, color):
        m = rle_ops.decode(r).astype(bool)
        if m.shape != img.shape[:2]:
            m = cv2.resize(m.astype(np.uint8),
                           (img.shape[1], img.shape[0]),
                           interpolation=cv2.INTER_NEAREST).astype(bool)
        layer = img.copy()
        layer[m] = color
        cv2.addWeighted(layer, alpha, img, 1 - alpha, 0, dst=img)
        contours, _ = cv2.findContours(m.astype(np.uint8),
                                       cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        cv2.drawContours(img, contours, -1, color, 2)

    if pred_mask_rle is not None:
        overlay(pred_mask_rle, PRED_COLOR)
    if gt_mask_rle is not None:
        overlay(gt_mask_rle, GT_COLOR)
    if out_file:
        cv2.imwrite(out_file, img)
    return img
