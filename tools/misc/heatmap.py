#!/usr/bin/env python
"""Prediction heatmap tool (reference tools/misc/heatmap.py): thin
front-end over the Grad-CAM implementation in vis_cam.py — kept as a
separate entry point for CLI-name parity."""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from vis_cam import main  # noqa: E402

if __name__ == "__main__":
    main()
