"""Dataset readers for the shared ``instances.json`` annotation schema.

Mirrors the reference's data layer (simvg/datasets/base.py:13-175 and the
loading op simvg/datasets/pipelines/loading.py:22-293) without the
mmcv Registry/DataContainer machinery:

- annotation file: ``{split: [ann, ...]}`` where ann has ``image_id``,
  ``expressions`` (list[str]), ``bbox`` (xywh; for GRefCOCO a list per
  expression of multi-target xywh boxes), ``height``/``width``, optional
  ``mask`` (RLE/polygon), optional ``data_source`` (Mixed), and for
  GRefCOCO ``annotations`` (list per expression of target dicts with
  ``category_id`` == -1 marking no-target).
- per-dataset image filename schemes (loading.py:82-95):
  ReferIt/Flickr ``{image_id}.jpg``; RefCOCO*
  ``COCO_train2014_%012d.jpg``; Mixed per-``data_source`` roots.
- expression sampling: uniform random among candidates — the reference
  does this even at eval (loading.py:108); we keep a seeded RNG so eval
  is reproducible.
- aspect-ratio group flag (base.py:57-62) for the group sampler.
"""

from __future__ import annotations

import copy
import json
import os.path as osp
import random
from typing import Optional, Sequence

import cv2
import numpy as np

from .tokenization import build_tokenizer, build_word_vocab
from .transforms import Compose

DATASET_CLASSES = (
    "GRefCOCO",
    "RefCOCOUNC",
    "RefCOCOGoogle",
    "RefCOCOgUMD",
    "RefCOCOgGoogle",
    "RefCOCOPlusUNC",
    "ReferItGameBerkeley",
    "Flickr30k",
    "Mixed",
)

VALID_SETS = (
    "train", "val", "testA", "testB", "test",
    "val_refcoco_unc", "val_refcocoplus_unc", "val_refcocog_umd",
    "val_flickr30k", "val_referitgame_berkeley",
)


def _filename_for(dataset: str, ann: dict, imgsfile) -> str:
    if "ReferItGame" in dataset or "Flickr30k" in dataset:
        return osp.join(imgsfile, "%d.jpg" % ann["image_id"])
    if "RefCOCO" in dataset or "GRefCOCO" == dataset:
        return osp.join(imgsfile,
                        "COCO_train2014_%012d.jpg" % ann["image_id"])
    if dataset == "Mixed":
        src = ann["data_source"]
        name = ("COCO_train2014_%012d.jpg" if "coco" in src else "%d.jpg")
        return osp.join(imgsfile[src], name % ann["image_id"])
    raise ValueError(dataset)


class BaseDataset:
    """One split of one dataset + its sample pipeline."""

    dataset_name = "RefCOCOUNC"

    def __init__(
        self,
        imgsfile,
        annsfile: str,
        which_set: str = "train",
        img_source: Sequence[str] = ("coco",),
        tokenizer=None,
        max_token: int = 20,
        transforms: Optional[Sequence] = None,
        with_bbox: bool = True,
        with_mask: bool = False,
        use_token_type: str = "beit3",
        spm_path: str = "pretrain_weights/beit3.spm",
        corpus_path: Optional[str] = None,
        seed: int = 6666,
        expr_sampling: str = "deterministic",
    ):
        assert which_set in VALID_SETS, which_set
        # reference loading.py:57: at least one annotation kind
        assert with_bbox or with_mask, \
            "set with_bbox and/or with_mask on the load op"
        self.which_set = which_set
        self.imgsfile = imgsfile
        self.max_token = max_token
        self.with_bbox = with_bbox
        self.with_mask = with_mask
        self.anns_all = json.load(open(annsfile))

        # Mixed pretraining source filter (base.py:43-44).
        if (self.anns_all.get("train")
                and self.anns_all["train"]
                and self.anns_all["train"][0].get("data_source")):
            self.anns_all["train"] = [
                a for a in self.anns_all["train"]
                if a["data_source"] in img_source
            ]

        if tokenizer is None:
            if use_token_type == "default":
                tokenizer = build_tokenizer(
                    "default", token2idx=build_word_vocab(self.anns_all)
                )
            elif use_token_type == "copus":
                tokenizer = build_tokenizer(
                    "copus", corpus_path=corpus_path)
            else:
                tokenizer = build_tokenizer(use_token_type,
                                            spm_path=spm_path)
        self.tokenizer = tokenizer
        self.num_token = tokenizer.vocab_size

        # "deterministic" (default): expression draw is a pure function
        # of (seed, epoch, index).  "global_rng": reference-parity mode —
        # np.random.choice on the GLOBAL numpy stream, exactly like
        # loading.py:108, so a single-worker eval reproduces the
        # reference's sampling for published-number parity (seed the
        # stream with np.random.seed(cfg.seed) first; draw order follows
        # iteration order, so use workers_per_gpu=1 for strict parity).
        assert expr_sampling in ("deterministic", "global_rng"), \
            expr_sampling
        self.expr_sampling = expr_sampling
        self.pipeline = Compose(transforms or [])
        self.seed = seed
        self.epoch = 0  # set by DataLoader.set_epoch for per-epoch
        # expression resampling; eval keeps 0 -> fully deterministic

        if which_set == "train":
            self._set_group_flag()
        else:
            self.flag = np.zeros(len(self), np.uint8)

    # -- core ----------------------------------------------------------
    def __len__(self):
        return len(self.anns_all[self.which_set])

    def _set_group_flag(self):
        """Aspect-ratio group flag (base.py:57-62): 1 if w/h > 1."""
        anns = self.anns_all[self.which_set]
        self.flag = np.asarray(
            [1 if a["width"] / a["height"] > 1 else 0 for a in anns],
            np.uint8,
        )

    def _load_image(self, ann: dict) -> np.ndarray:
        path = _filename_for(self.dataset_name, ann, self.imgsfile)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img

    def __getitem__(self, index: int) -> dict:
        ann = self.anns_all[self.which_set][index]
        img = self._load_image(ann)
        s: dict = {
            "ann": ann,
            "filename": _filename_for(self.dataset_name, ann,
                                      self.imgsfile),
            "img": img,
            "img_shape": img.shape,
            "ori_shape": img.shape,
            "pad_shape": img.shape,
            "scale_factor": np.ones(4, np.float32),
            "with_bbox": self.with_bbox,
            "with_mask": self.with_mask,
        }
        # expression sampling (loading.py:105-110).  The reference draws
        # from a global RNG whose stream depends on worker scheduling;
        # here the draw is a pure function of (seed, epoch, index), so
        # it is reproducible under any thread interleaving and eval
        # (epoch pinned to 0) is exactly repeatable.
        exprs = ann["expressions"]
        if self.expr_sampling == "global_rng":
            # reference-parity draw (loading.py:108)
            expr_idx = int(np.random.choice(len(exprs)))
        else:
            expr_rng = np.random.default_rng(
                (self.seed, self.epoch, index)
            )
            expr_idx = int(expr_rng.integers(0, len(exprs)))
        # deterministic augmentation stream for this (epoch, sample)
        s["aug_rng"] = random.Random(
            f"{self.seed}/{self.epoch}/{index}/aug"
        )
        expression = exprs[expr_idx]
        ids, mask = self.tokenizer.encode(expression, self.max_token)
        s["expression"] = expression
        s["ref_expr_inds"] = ids
        s["text_attention_mask"] = mask
        s["max_token"] = self.max_token

        if self.with_bbox:
            self._load_bbox(s, ann, expr_idx)
        if self.with_mask:
            self._load_mask(s, ann)
        s = self.pipeline(s)
        if s["expression"] != expression:
            # a transform rewrote the text (VGTRAugment's flip swaps
            # left<->right in the phrase) — the token ids encoded above
            # would silently keep saying the original side (the
            # reference's VGTR dataset tokenizes AFTER augmentation,
            # vgtr_aug.py:22-27)
            ids, mask = self.tokenizer.encode(s["expression"],
                                              self.max_token)
            s["ref_expr_inds"] = ids
            s["text_attention_mask"] = mask
        return s

    def _load_mask(self, s: dict, ann: dict):
        """Polygon-or-RLE GT mask -> bitmap + RLE (loading.py:241-262)."""
        from simvg_tpu.ops import rle as rle_ops

        mask = ann["mask"]
        h, w = s["ori_shape"][:2]
        is_crowd = 0
        if isinstance(mask, list):  # polygon(s)
            rles = rle_ops.frPyObjects(mask, h, w)
            if len(rles) > 1:
                is_crowd = 1
            r = rle_ops.merge(rles)
        else:
            r = mask
        s["gt_mask"] = rle_ops.decode(r)
        s["gt_mask_rle"] = r
        s["is_crowd"] = is_crowd

    def _load_bbox(self, s: dict, ann: dict, expr_idx: int):
        """xywh -> xyxy, clipped (loading.py:211-222)."""
        h, w = s["ori_shape"][:2]
        bbox = np.asarray(copy.deepcopy(ann["bbox"]), np.float64)
        bbox[2] += bbox[0]
        bbox[3] += bbox[1]
        bbox[0::2] = np.clip(bbox[0::2], 0, w - 1)
        bbox[1::2] = np.clip(bbox[1::2], 0, h - 1)
        s["gt_bbox"] = bbox


class GRefCOCO(BaseDataset):
    """Generalized REC: multi-target / no-target expressions
    (loading.py:224-239)."""

    dataset_name = "GRefCOCO"

    def _load_bbox(self, s: dict, ann: dict, expr_idx: int):
        h, w = s["ori_shape"][:2]
        boxes = []
        for bb in copy.deepcopy(ann["bbox"][expr_idx]):
            bb = np.asarray(bb, np.float64)
            bb[2] += bb[0]
            bb[3] += bb[1]
            bb[0::2] = np.clip(bb[0::2], 0, w - 1)
            bb[1::2] = np.clip(bb[1::2], 0, h - 1)
            boxes.append(bb)
        s["gt_bbox"] = boxes
        s["target"] = copy.deepcopy(ann["annotations"][expr_idx])


class RefCOCOUNC(BaseDataset):
    dataset_name = "RefCOCOUNC"


class RefCOCOGoogle(BaseDataset):
    dataset_name = "RefCOCOGoogle"


class RefCOCOgUMD(BaseDataset):
    dataset_name = "RefCOCOgUMD"


class RefCOCOgGoogle(BaseDataset):
    dataset_name = "RefCOCOgGoogle"


class RefCOCOPlusUNC(BaseDataset):
    dataset_name = "RefCOCOPlusUNC"


class ReferItGameBerkeley(BaseDataset):
    dataset_name = "ReferItGameBerkeley"


class Flickr30k(BaseDataset):
    dataset_name = "Flickr30k"


class Mixed(BaseDataset):
    dataset_name = "Mixed"


_REGISTRY = {c.__name__: c for c in (
    GRefCOCO, RefCOCOUNC, RefCOCOGoogle, RefCOCOgUMD, RefCOCOgGoogle,
    RefCOCOPlusUNC, ReferItGameBerkeley, Flickr30k, Mixed,
)}


def build_dataset(dataset: str, **kw) -> BaseDataset:
    """build_dataset equivalent (simvg/datasets/builder.py:17-22)."""
    return _REGISTRY[dataset](**kw)
