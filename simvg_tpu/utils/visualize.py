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
