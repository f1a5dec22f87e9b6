#!/usr/bin/env python
"""Convert mdetr-style GRefCOCO COCO-format annotations into the SimVG
``instances.json`` schema (reference tools/data_process/
convert_gref.py:1-75 semantics, without the torchvision dependency):

input:  finetune_grefcoco_{split}.json (COCO format; each "image" entry
        carries original_id + caption; its annotations may include
        category_id == -1 no-target records)
output: {split: [{image_id, height, width,
                  expressions: [str, ...],
                  bbox: [[xywh, ...] per expression],
                  annotations: [[{category_id, ...}, ...] per expr]}]}
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
from collections import defaultdict


def convert_split(ann_file: str, group: bool = True) -> list:
    """group=True: merge every expression of the same original image
    into one record (reference convert_gref.py).  group=False: one
    record per (image, expression) pair — the eval-split behavior of
    the reference's convert_gref_only_format_trainset.py variant
    (tools/data_process/convert_gref_only_format_trainset.py:50-83,
    which groups ONLY the trainset and keys eval records by index)."""
    coco = json.load(open(ann_file))
    anns_by_img = defaultdict(list)
    for a in coco.get("annotations", []):
        anns_by_img[a["image_id"]].append(a)

    by_original = {}
    out = []
    for img in coco["images"]:
        original_id = img.get("original_id", img["id"])
        caption = img.get("caption", "")
        targets = anns_by_img.get(img["id"], [])
        bboxes = [t["bbox"] for t in targets]
        if group:
            rec = by_original.setdefault(original_id, {
                "image_id": original_id,
                "height": img["height"],
                "width": img["width"],
                "expressions": [],
                "bbox": [],
                "annotations": [],
            })
            rec["expressions"].append(caption)
            rec["bbox"].append(bboxes)
            rec["annotations"].append(targets)
        else:
            out.append({
                "image_id": original_id,
                "height": img["height"],
                "width": img["width"],
                "expressions": [caption],
                "bbox": [bboxes],
                "annotations": [targets],
            })
    return list(by_original.values()) if group else out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ann_dir",
                   help="dir with finetune_grefcoco_{split}.json files")
    p.add_argument("output", help="output instances.json")
    p.add_argument("--splits", nargs="*",
                   default=["train", "val", "testA", "testB"])
    p.add_argument("--trainset-only", action="store_true",
                   help="reference convert_gref_only_format_trainset.py "
                        "behavior: group expressions per image for the "
                        "train split ONLY; eval splits emit one record "
                        "per (image, expression) pair")
    args = p.parse_args()

    out = {}
    for split in args.splits:
        f = osp.join(args.ann_dir, f"finetune_grefcoco_{split}.json")
        out[split] = convert_split(
            f, group=(split == "train") if args.trainset_only else True)
        print(f"{split}: {len(out[split])} records")
    with open(args.output, "w") as fh:
        json.dump(out, fh)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
