#!/usr/bin/env python
"""Generate a synthetic RefCOCO-style dataset (see tests/util_synth.py)
for smoke-testing the full CLI without real data assets."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tests"))

from util_synth import make_grefcoco_style, make_refcoco_style  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/simvg_tpu_synth")
    p.add_argument("--style", default="refcoco",
                   choices=["refcoco", "grefcoco"])
    p.add_argument("--n-train", type=int, default=16)
    p.add_argument("--n-val", type=int, default=8)
    p.add_argument("--img-hw", type=int, nargs=2, default=(120, 160),
                   help="original image size (non-square by default so "
                        "eval exercises non-unit scale factors)")
    args = p.parse_args()
    if args.style == "refcoco":
        imgdir, annfile = make_refcoco_style(args.root, args.n_train,
                                             args.n_val,
                                             img_hw=tuple(args.img_hw))
    else:
        imgdir, annfile = make_grefcoco_style(args.root, args.n_train)
    print(f"images: {imgdir}\nannotations: {annfile}")


if __name__ == "__main__":
    main()
