"""Batching + static-shape collation + prefetching loader.

Replaces the reference's torch DataLoader/DataContainer stack
(simvg/datasets/builder.py:25-56, utils.py:37-118) with a
TPU-friendly host loader:

- every batch has STATIC shapes: images live on a fixed (canvas, canvas)
  NHWC canvas, GT boxes are padded to ``max_gt`` with a validity mask,
  text is padded to ``max_token`` upstream.  XLA compiles the train step
  exactly once.
- aspect-ratio group batching (GroupSampler semantics,
  mmdet samplers referenced at builder.py:31-37): batches are drawn from
  one flag group, with an epoch-seeded shuffle
  (``sampler.set_epoch`` equivalent, apis/train.py:40-41).
- data-parallel sharding by host: ``shard_id``/``num_shards`` slice the
  batch stream like DistributedSampler.
- a thread pool decodes/transforms samples concurrently (cv2 releases
  the GIL), double-buffering the next batch while the device computes.

Batch dict (numpy): image [B,H,W,3] f32, text_ids [B,T] i32,
text_padding_mask [B,T] i32, img_shape [B,2] i32, scale_factor [B,4]
f32, gt_boxes [B,max_gt,4] f32, gt_labels [B,max_gt] i32,
gt_valid [B,max_gt] bool, gt_count [B] i32 (untruncated object-GT
count, feeds the loss num_boxes), batch_valid [B] bool (False = wrap-padding in
the final eval batch), meta: list of per-sample dicts (expression,
filename, target, ori_shape).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


def collate(samples: List[dict], canvas: int, max_gt: int = 1,
            valid: Optional[List[bool]] = None,
            text_buckets: Optional[List[int]] = None) -> Dict:
    b = len(samples)
    # preserve uint8 when the pipeline skips host normalisation
    # (normalize_on_device): 4x smaller canvas + host->device transfer
    img_dtype = samples[0]["img"].dtype if b else np.float32
    if img_dtype not in (np.uint8, np.float32):
        img_dtype = np.float32
    image = np.zeros((b, canvas, canvas, 3), img_dtype)
    img_shape = np.zeros((b, 2), np.int32)
    scale_factor = np.ones((b, 4), np.float32)
    t = len(samples[0]["ref_expr_inds"])
    text_ids = np.zeros((b, t), np.int32)
    text_mask = np.ones((b, t), np.int32)
    gt_boxes = np.zeros((b, max_gt, 4), np.float32)
    gt_labels = np.zeros((b, max_gt), np.int32)
    gt_valid = np.zeros((b, max_gt), bool)
    gt_count = np.zeros((b,), np.int32)
    meta = []

    for i, s in enumerate(samples):
        img = s["img"]
        h, w = img.shape[:2]
        assert h <= canvas and w <= canvas, (img.shape, canvas)
        image[i, :h, :w] = img
        img_shape[i] = (s["img_shape"][0], s["img_shape"][1])
        scale_factor[i] = s.get("scale_factor", np.ones(4, np.float32))
        text_ids[i] = s["ref_expr_inds"]
        text_mask[i] = s["text_attention_mask"]

        gb = s.get("gt_bbox")
        if gb is not None:
            boxes = gb if isinstance(gb, list) else [gb]
            target = s.get("target")
            # UNTRUNCATED object-GT count: the reference's loss
            # normalisation num_boxes counts the FULL target list
            # (after dropping GRec no-target rows), even when it
            # exceeds num_queries (simvg/core/criterion/
            # criterion.py:244-249 over prepare_soft_targets output,
            # tgqs_kd_detr_head.py:222-231); the device arrays below
            # stay truncated to max_gt for the matcher's static shapes.
            if target is not None:
                gt_count[i] = sum(
                    1 for tt in target if tt.get("category_id") != -1
                )
            else:
                gt_count[i] = len(boxes)
            for j, bb in enumerate(boxes[:max_gt]):
                gt_boxes[i, j] = bb
                gt_valid[i, j] = True
                if target is not None:
                    gt_labels[i, j] = (
                        1 if target[j].get("category_id") == -1 else 0
                    )
        meta.append({
            "filename": s.get("filename"),
            "expression": s.get("expression"),
            "ori_shape": s.get("ori_shape"),
            "img_shape": s.get("img_shape"),
            "target": s.get("target"),
            "gt_mask_rle": s.get("gt_mask_rle"),
            "is_crowd": s.get("is_crowd"),
            # FULL GT list (untruncated): the GRec F1 denominator must
            # count every target even beyond max_gt/num_queries (the
            # reference evaluates against the full ragged list,
            # apis/test.py:127-152); the device arrays above stay
            # truncated for the matcher's static shapes
            "gt_bbox_all": (
                np.asarray(
                    gb if isinstance(gb, list) else [gb], np.float64
                ).reshape(-1, 4)
                if gb is not None else None
            ),
        })

    if text_buckets:
        # Pad-length bucketing: shrink the text axis to the smallest
        # bucket covering the longest real expression in the batch.
        # Each bucket is its own jit specialisation (2-3 buckets total),
        # so short expressions skip the attention cost of the full
        # max_token padding.
        real = int((text_mask == 0).sum(axis=1).max()) if b else 0
        fit = [bk for bk in sorted(text_buckets) if bk >= real]
        bucket = min(fit[0] if fit else t, t)
        text_ids = text_ids[:, :bucket]
        text_mask = text_mask[:, :bucket]

    return {
        "image": image,
        "text_ids": text_ids,
        "text_padding_mask": text_mask,
        "img_shape": img_shape,
        "scale_factor": scale_factor,
        "gt_boxes": gt_boxes,
        "gt_labels": gt_labels,
        "gt_valid": gt_valid,
        "gt_count": gt_count,
        "batch_valid": np.asarray(
            valid if valid is not None else [True] * b, bool
        ),
        "meta": meta,
    }


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        canvas: int,
        max_gt: int = 1,
        shuffle: bool = True,
        group_by_flag: bool = True,
        drop_last: Optional[bool] = None,
        num_workers: int = 8,
        seed: int = 6666,
        shard_id: int = 0,
        num_shards: int = 1,
        text_buckets: Optional[List[int]] = None,
    ):
        self.ds = dataset
        self.bs = batch_size
        self.canvas = canvas
        self.max_gt = max_gt
        self.shuffle = shuffle
        self.group_by_flag = group_by_flag and shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        if num_shards > 1 and text_buckets:
            # multi-host: the bucket choice is a function of the LOCAL
            # batch content, so different processes could pick different
            # widths for the same SPMD step (mismatched global shapes).
            # Pin the single largest bucket instead.
            text_buckets = [max(text_buckets)]
        self.text_buckets = text_buckets
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Epoch-seeded reshuffle (DistributedGroupSampler semantics) +
        per-epoch expression resampling."""
        self.epoch = epoch
        if self.shuffle and hasattr(self.ds, "epoch"):
            self.ds.epoch = epoch

    def _index_batches(self) -> List[Tuple[List[int], bool]]:
        """Returns [(sample_indices, is_wrap_pad)] for this shard;
        is_wrap_pad marks whole-batch duplicates added only so every
        shard yields the same number of SPMD steps — their samples must
        not count in metrics (batch_valid=False)."""
        n = len(self.ds)
        rng = np.random.default_rng(self.seed + self.epoch)
        if not self.shuffle:
            batches = [np.arange(n)[k:k + self.bs].tolist()
                       for k in range(0, n, self.bs)]
        elif self.group_by_flag:
            order = []
            for flag in np.unique(self.ds.flag):
                idx = np.flatnonzero(self.ds.flag == flag)
                rng.shuffle(idx)
                order.append(idx)
            # round each group up to full batches by wrapping, like
            # mmdet GroupSampler
            chunks = []
            for idx in order:
                pad = (-len(idx)) % self.bs
                if pad and not self.drop_last:
                    idx = np.concatenate([idx, idx[:pad]])
                # wrap-pad above makes len(idx) a multiple of bs unless
                # drop_last, in which case the tail is dropped here
                for k in range(0, len(idx) - (len(idx) % self.bs),
                               self.bs):
                    chunks.append(idx[k:k + self.bs].tolist())
            rng.shuffle(chunks)
            batches = chunks
        else:
            order = np.arange(n)
            rng.shuffle(order)
            batches = [order[k:k + self.bs].tolist()
                       for k in range(0, n, self.bs)]

        if self.drop_last:
            batches = [b for b in batches if len(b) == self.bs]
        flagged = [(b, False) for b in batches]
        if self.num_shards > 1 and flagged:
            # every process must yield the SAME number of batches per
            # epoch: each train step is a global SPMD collective, so a
            # host with an extra batch would hang at epoch end (the
            # reference's DistributedGroupSampler pads ranks to equal
            # totals for the same reason). Wrap-pad to a multiple of
            # num_shards before slicing; the duplicates are flagged so
            # eval does not double-count their samples.
            pad = (-len(flagged)) % self.num_shards
            if pad:
                flagged = flagged + [(b, True) for b, _ in flagged[:pad]]
        return flagged[self.shard_id::self.num_shards]

    def __len__(self):
        return len(self._index_batches())

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()

        # one persistent decode pool for the whole epoch (creating and
        # joining a pool per batch costs thread setup on the hot path)
        from concurrent.futures import ThreadPoolExecutor as TPE

        def make(item, ex):
            idx_list, is_pad = item
            valid = [not is_pad] * len(idx_list)
            # static shapes: wrap-pad the final short batch
            while len(idx_list) < self.bs:
                idx_list = idx_list + idx_list[: self.bs - len(idx_list)]
                valid = valid + [False] * (len(idx_list) - len(valid))
            samples = list(ex.map(self.ds.__getitem__, idx_list))
            return collate(samples, self.canvas, self.max_gt, valid,
                           text_buckets=self.text_buckets)

        # double-buffer: build batch k+1 while k is consumed
        with ThreadPoolExecutor(self.num_workers) as ex, \
                TPE(1) as prefetcher:
            fut = None
            for k, item in enumerate(batches):
                if fut is None:
                    fut = prefetcher.submit(make, item, ex)
                cur = fut.result()
                fut = (prefetcher.submit(make, batches[k + 1], ex)
                       if k + 1 < len(batches) else None)
                yield cur
