#!/usr/bin/env python
"""Expression token-length statistics (reference
tools/misc/dataset_token_count.py): histogram of tokenised expression
lengths, for choosing max_token / pad buckets."""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("annsfile")
    p.add_argument("--split", default="train")
    p.add_argument("--tokenizer", default="beit3")
    p.add_argument("--spm-path", default=None)
    args = p.parse_args()

    from simvg_tpu.data.tokenization import build_tokenizer, clean_string

    tok = build_tokenizer(args.tokenizer, spm_path=args.spm_path)
    anns = json.load(open(args.annsfile))[args.split]
    lengths = []
    for ann in anns:
        for expr in ann["expressions"]:
            n = len(tok.tokenize_to_ids(clean_string(expr)))
            lengths.append(n + 2)  # +BOS/EOS
    lengths = np.asarray(lengths)
    print(f"expressions: {len(lengths)}")
    print(f"mean {lengths.mean():.1f}  p50 {np.percentile(lengths, 50):.0f}"
          f"  p95 {np.percentile(lengths, 95):.0f}"
          f"  p99 {np.percentile(lengths, 99):.0f}"
          f"  max {lengths.max()}")
    hist = Counter((lengths // 5 * 5).tolist())
    for k in sorted(hist):
        print(f"  len {k:3d}-{k + 4:3d}: {hist[k]}")


if __name__ == "__main__":
    main()
