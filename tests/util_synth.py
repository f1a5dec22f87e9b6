"""Synthetic dataset fixtures in the reference's instances.json schema."""

import json
import os

import cv2
import numpy as np


def make_refcoco_style(root, n_train=8, n_val=4, img_hw=(120, 160)):
    """RefCOCOUNC-style dataset: single box per expression."""
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)
    rng = np.random.default_rng(0)
    anns = {"train": [], "val": []}
    for split, n in (("train", n_train), ("val", n_val)):
        for i in range(n):
            image_id = (0 if split == "train" else 1000) + i
            h, w = img_hw
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            x, y = rng.integers(5, w // 2), rng.integers(5, h // 2)
            bw, bh = rng.integers(10, w // 2), rng.integers(10, h // 2)
            cv2.rectangle(img, (int(x), int(y)),
                          (int(x + bw), int(y + bh)), (0, 255, 0), -1)
            cv2.imwrite(
                os.path.join(imgdir,
                             "COCO_train2014_%012d.jpg" % image_id), img
            )
            anns[split].append({
                "image_id": int(image_id),
                "height": h,
                "width": w,
                "bbox": [int(x), int(y), int(bw), int(bh)],  # xywh
                "expressions": ["the green box", "green rectangle area"],
            })
    path = os.path.join(root, "instances.json")
    json.dump(anns, open(path, "w"))
    return imgdir, path


def make_grefcoco_style(root, n=6, img_hw=(96, 128)):
    """GRefCOCO-style: multi-target and no-target expressions.

    Targets are drawn as green rectangles so the mapping is LEARNABLE
    (a convergence run can validate the multi-target matching + F1
    path); no-target samples have no green content."""
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)
    rng = np.random.default_rng(1)
    anns = {"train": [], "val": []}
    for split in ("train", "val"):
        for i in range(n):
            image_id = (2000 if split == "train" else 3000) + i
            h, w = img_hw
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            if i % 3 == 2:  # no-target expression (no green content)
                bbox = [[[0, 0, 0, 0]]]
                annotations = [[{"category_id": -1}]]
            else:
                k = 1 + i % 2
                boxes = []
                targets = []
                for t in range(k):
                    # disjoint halves so two targets never merge
                    x = int(rng.integers(t * w // 2,
                                         t * w // 2 + w // 4))
                    y = int(rng.integers(0, h // 2))
                    bw = int(rng.integers(w // 5, w // 4))
                    bh = int(rng.integers(h // 4, h // 2))
                    cv2.rectangle(img, (x, y), (x + bw, y + bh),
                                  (0, 255, 0), -1)
                    boxes.append([x, y, bw, bh])
                    targets.append({"category_id": 1})
                bbox = [boxes]
                annotations = [targets]
            cv2.imwrite(
                os.path.join(imgdir,
                             "COCO_train2014_%012d.jpg" % image_id), img
            )
            anns[split].append({
                "image_id": int(image_id),
                "height": h,
                "width": w,
                "bbox": bbox,  # [expr][target][xywh]
                "expressions": ["some things maybe"],
                "annotations": annotations,
            })
    path = os.path.join(root, "instances.json")
    json.dump(anns, open(path, "w"))
    return imgdir, path


def make_mixed_style(root, n_per_source=4, n_val=4, img_hw=(100, 140)):
    """Mixed pretraining-style dataset (reference
    configs/_base_/datasets/detection/mixed.py:29-50): per-source image
    roots (coco filename scheme vs flickr bare ids), a
    ``visual-genome`` record with NO image on disk (img_source
    filtering must drop it before any read), and a
    ``val_refcoco_unc`` sub-validation split."""
    coco_dir = os.path.join(root, "coco")
    flickr_dir = os.path.join(root, "flickr")
    os.makedirs(coco_dir, exist_ok=True)
    os.makedirs(flickr_dir, exist_ok=True)
    rng = np.random.default_rng(3)
    h, w = img_hw

    def record(image_id, source):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        x, y = int(rng.integers(5, w // 2)), int(rng.integers(5, h // 2))
        bw, bh = int(rng.integers(10, w // 2)), int(rng.integers(10, h // 2))
        cv2.rectangle(img, (x, y), (x + bw, y + bh), (0, 255, 0), -1)
        if source == "coco":
            cv2.imwrite(os.path.join(
                coco_dir, "COCO_train2014_%012d.jpg" % image_id), img)
        elif source == "flickr":
            cv2.imwrite(os.path.join(flickr_dir, f"{image_id}.jpg"), img)
        # visual-genome: intentionally NO image written
        return {"image_id": int(image_id), "height": h, "width": w,
                "bbox": [x, y, bw, bh],
                "expressions": ["the green box"],
                "data_source": source}

    anns = {"train": [], "val_refcoco_unc": []}
    nid = 0
    for source in ("coco", "flickr"):
        for _ in range(n_per_source):
            anns["train"].append(record(nid, source))
            nid += 1
    # a source the configs filter out — and whose image doesn't exist
    anns["train"].append(record(nid, "visual-genome"))
    nid += 1
    for _ in range(n_val):
        anns["val_refcoco_unc"].append(record(1000 + nid, "coco"))
        nid += 1
    path = os.path.join(root, "instances.json")
    json.dump(anns, open(path, "w"))
    return root, path
