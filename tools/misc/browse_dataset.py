#!/usr/bin/env python
"""Pipeline-output inspection (reference tools/misc/browse_dataset.py):
runs the configured train pipeline and dumps images with their GT boxes
and expressions, un-normalising for display."""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--which-set", default="train")
    p.add_argument("--output-dir", default="browse_out")
    p.add_argument("--num", type=int, default=20)
    p.add_argument("--platform", default=None)
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="dotted overrides key=value")
    args = p.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    from simvg_tpu.config import Config, parse_cfg_options
    from simvg_tpu.data.builder import build_dataset_from_cfg
    from simvg_tpu.utils.visualize import imshow_expr_bbox

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(parse_cfg_options(args.cfg_options))
    ds = build_dataset_from_cfg(cfg.data[args.which_set],
                                dataset_type=cfg.get("dataset"))
    os.makedirs(args.output_dir, exist_ok=True)

    norm = cfg.get("img_norm_cfg", {})
    mean = np.asarray(norm.get("mean", [0, 0, 0]), np.float32)
    std = np.asarray(norm.get("std", [1, 1, 1]), np.float32)

    for i in range(min(args.num, len(ds))):
        s = ds[i]
        img = s["img"]
        if img.dtype != np.uint8:  # un-normalise, RGB -> BGR
            img = (img * std + mean)[..., ::-1]
            img = np.clip(img, 0, 255).astype(np.uint8)
        gb = s.get("gt_bbox")
        boxes = np.stack(gb) if isinstance(gb, list) else gb
        out = osp.join(args.output_dir, f"{i:04d}.jpg")
        imshow_expr_bbox(img, np.zeros((0, 4)), out, gt_bbox=boxes,
                         expression=s.get("expression"))
    print(f"wrote {min(args.num, len(ds))} images to {args.output_dir}")


if __name__ == "__main__":
    main()
