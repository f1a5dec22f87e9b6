#!/usr/bin/env python
"""Summarize training runs from their metrics.jsonl streams.

No reference analogue (the reference logs through mmcv and ships no log
analyzer); this consumes the structured metric stream tools/train.py
emits (observability row, SURVEY.md §5) and prints, per work_dir and
eval split, the best and final epochs' branch metrics — the numbers the
convergence/distillation tables in README/ROADMAP are built from.

Usage:
    python tools/misc/summarize_run.py work_dir/converge_big_* [--key token_det_acc]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp


def load_evals(work_dir):
    """eval rows from <work_dir>/metrics.jsonl, grouped by split."""
    path = osp.join(work_dir, "metrics.jsonl")
    by_split = {}
    if not osp.exists(path):
        return by_split
    with open(path) as f:
        for line in f:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:  # torn write (crash mid-line)
                continue
            if row.get("kind") != "eval":
                continue
            by_split.setdefault(row.get("split", "val"), []).append(row)
    return by_split


def summarize(work_dir, sort_key):
    by_split = load_evals(work_dir)
    name = osp.basename(osp.normpath(work_dir))
    if not by_split:
        print(f"{name}: no eval rows (metrics.jsonl missing or "
              "train-only)")
        return
    for split, rows in by_split.items():
        # a resumed run may re-emit an epoch; keep the LAST occurrence
        # (it is the one produced by the weights that training continued
        # from)
        dedup = {}
        for r in rows:
            dedup[r["epoch"]] = r
        rows = [dedup[e] for e in sorted(dedup)]
        final = rows[-1]
        best = max(rows, key=lambda r: r.get(sort_key, float("-inf")))
        cols = [k for k in ("decoder_det_acc", "decoder_miou",
                            "token_det_acc", "token_miou",
                            "F1_score", "N_acc")
                if k in final]

        def fmt(r):
            vals = ", ".join(f"{k}={r[k]:.2f}" for k in cols)
            return f"epoch {r['epoch']:>4}: {vals}"

        print(f"{name} [{split}] ({len(rows)} evals)")
        print(f"  final {fmt(final)}")
        if best["epoch"] != final["epoch"]:
            print(f"  best({sort_key}) {fmt(best)}")


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("work_dirs", nargs="+")
    p.add_argument("--key", default="token_det_acc",
                   help="metric used to pick the 'best' epoch")
    args = p.parse_args()
    for wd in args.work_dirs:
        summarize(wd, args.key)


if __name__ == "__main__":
    main()
