"""Evaluation loop (evaluate_model, simvg/apis/test.py:166-293).

Per-batch: jitted dual-branch forward + decoded predictions on device;
Prec@0.5 / GRec F1+N-acc accumulate on host with the final wrap-padded
batch masked via ``batch_valid``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import numpy as np

from .metrics import detection_accuracy, grec_f1_nacc
from .train import make_eval_step


def _local_rows(arr) -> np.ndarray:
    """Host-local rows of a (possibly multi-host global) prediction.

    Single process: plain np.asarray. Multi-host: the batch axis is
    sharded over processes, so only this host's shards are addressable —
    concatenate them in global row order, which matches the local batch
    this process contributed via make_array_from_process_local_data."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def _allgather_sum(vec: np.ndarray) -> np.ndarray:
    """Sum a small counter vector across processes (the reference's
    reduce_mean/all_reduce over ranks, simvg/utils/distributed.py:21-27)."""
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(vec))
    ).sum(axis=0)


def evaluate(
    model,
    params,
    loader,
    *,
    is_grec: bool = False,
    eval_step: Optional[Callable] = None,
    log_fn: Optional[Callable[[str], None]] = None,
    log_interval: int = 50,
    put_fn: Optional[Callable[[Dict], Dict]] = None,
    max_batches: Optional[int] = None,
) -> Dict[str, float]:
    """Returns per-branch metrics + the reference's summary scalar pair
    (mean det_acc over branches; for GRec (F1, N-acc)).

    put_fn: optional transform placing the device batch (e.g. sharded
    over the mesh's data axis, or assembled into global arrays on
    multi-host) before the jitted step.
    max_batches: stop after N batches (bounded sweeps, e.g. the
    token-prune envelope tool); metrics then cover a subset."""
    step = eval_step or jax.jit(make_eval_step(model))

    _MASK_THRS = (0.5, 0.6, 0.7, 0.8, 0.9)
    acc: Dict[str, Dict] = {
        b: {"iou_hits": 0, "iou_sum": 0.0, "n": 0,
            "mask": {"iou_sum": 0.0,
                     "hits": np.zeros(len(_MASK_THRS)), "n": 0},
            "grec": {"boxes": [], "scores": [], "gts": [], "targets": []}}
        for b in ("decoder", "token")
    }

    # the eval step consumes exactly these keys (make_eval_step);
    # gt_*/scale_factor/batch_valid stay host-side for the metrics —
    # transferring them per batch wasted host->device bandwidth
    _DEVICE_KEYS = ("image", "text_ids", "text_padding_mask",
                    "img_shape")
    batches = len(loader)
    if max_batches is not None:
        batches = min(batches, max_batches)
    for bi, batch in enumerate(loader):
        if bi >= batches:
            break
        device_batch = {
            k: batch[k] for k in _DEVICE_KEYS if k in batch
        }
        if put_fn is not None:
            device_batch = put_fn(device_batch)
        preds = step(params, device_batch)
        valid = np.asarray(batch["batch_valid"])

        for branch in ("decoder", "token"):
            p = preds[branch]
            if not is_grec:
                m = detection_accuracy(
                    _local_rows(p["best_box"]),
                    batch["gt_boxes"][:, 0, :],
                    valid,
                )
                a = acc[branch]
                a["iou_hits"] += m["det_acc"] / 100.0 * m["n"]
                a["iou_sum"] += m["miou"] / 100.0 * m["n"]
                a["n"] += m["n"]
                # mask mIoU path (reference accuracy() eval_mask,
                # simvg/apis/test.py:81-88, 234-250): when a model
                # emits per-image masks and the dataset carries GT RLE,
                # accumulate aligned mask IoU + acc@thresholds.
                # PRODUCER GAP: the SimVG model family is det-only —
                # no shipped head emits "pred_masks" (the reference's
                # mask path likewise serves only legacy SeqTR-style
                # models it ships no configs for), so out["miou"] stays
                # 0.0 for every shipped eval entry point today; a
                # custom mask head only has to put "pred_masks" in its
                # decoded predictions to light this up.
                pm = p.get("pred_masks")
                if pm is not None:
                    from simvg_tpu.ops import rle as rle_ops

                    pm_rows = (pm if isinstance(pm, (list, tuple))
                               else _local_rows(pm))
                    for i in range(len(valid)):
                        if not valid[i]:
                            continue
                        meta_i = batch["meta"][i]
                        gtr = meta_i.get("gt_mask_rle")
                        pr = pm_rows[i]
                        if gtr is None or pr is None:
                            continue
                        if not isinstance(pr, dict):
                            pr = rle_ops.encode(
                                np.asarray(pr, np.uint8))
                        crowd = [int(meta_i.get("is_crowd") or 0)]
                        iou = float(
                            rle_ops.iou([pr], [gtr], crowd)[0, 0])
                        mk = a["mask"]
                        mk["iou_sum"] += iou
                        mk["hits"] += np.asarray(
                            [iou >= t for t in _MASK_THRS], float)
                        mk["n"] += 1
            else:
                g = acc[branch]["grec"]
                boxes = _local_rows(p["boxes"])
                scores = _local_rows(p["scores"])
                for i in range(boxes.shape[0]):
                    if not valid[i]:
                        continue
                    g["boxes"].append(boxes[i])
                    g["scores"].append(scores[i])
                    # full untruncated GT from meta: images with more
                    # targets than num_queries keep the true F1
                    # denominator (reference apis/test.py:127-152)
                    m = batch["meta"][i]
                    if m.get("gt_bbox_all") is not None:
                        g["gts"].append(np.asarray(m["gt_bbox_all"]))
                    else:
                        nt = int(batch["gt_valid"][i].sum())
                        g["gts"].append(batch["gt_boxes"][i, :nt])
                    g["targets"].append(m["target"])

        if log_fn and ((bi + 1) % log_interval == 0 or bi + 1 == batches):
            if not is_grec:
                msg = ", ".join(
                    "{}Det@.5: {:.2f}".format(
                        b,
                        acc[b]["iou_hits"] / max(acc[b]["n"], 1) * 100,
                    )
                    for b in ("decoder", "token")
                )
            else:
                msg = f"[{bi + 1}/{batches}] grec eval accumulating"
            log_fn(f"val - [{bi + 1}/{batches}] {msg}")

    multi = jax.process_count() > 1
    out: Dict[str, float] = {}
    if not is_grec:
        n_samples = 0.0
        for b in ("decoder", "token"):
            hits, iou_sum, n = (acc[b]["iou_hits"], acc[b]["iou_sum"],
                                acc[b]["n"])
            if multi:
                hits, iou_sum, n = _allgather_sum(
                    np.asarray([hits, iou_sum, n], np.float64))
            # both branches see every sample; capture the aggregated
            # count BEFORE the divide-by-zero clamp so an empty split
            # reports n_samples=0, not 1 (ADVICE r4)
            n_samples = float(n)
            n = max(n, 1)
            out[f"{b}_det_acc"] = hits / n * 100.0
            out[f"{b}_miou"] = iou_sum / n * 100.0
        # cross-process-aggregated REAL sample count (wrap-pad
        # duplicates excluded) — must equal len(split) regardless of
        # sharding; the multihost tests assert exactly that
        out["n_samples"] = n_samples
        out["det_acc"] = (out["decoder_det_acc"]
                          + out["token_det_acc"]) / 2.0
        # summary miou = mask mIoU when masks were evaluated (the
        # reference's returned miou is the MASK IoU; it stays 0 for
        # box-only models, apis/test.py:234-250)
        mask_mious = []
        for b in ("decoder", "token"):
            mk = acc[b]["mask"]
            iou_sum, hits, n = mk["iou_sum"], mk["hits"], float(mk["n"])
            if multi:
                agg = _allgather_sum(np.concatenate(
                    [[iou_sum, n], hits]).astype(np.float64))
                iou_sum, n, hits = agg[0], agg[1], agg[2:]
            if n > 0:
                out[f"{b}_mask_miou"] = iou_sum / n * 100.0
                for t, h in zip(_MASK_THRS, hits):
                    out[f"{b}_mask_acc@{t}"] = h / n * 100.0
                mask_mious.append(out[f"{b}_mask_miou"])
        out["miou"] = float(np.mean(mask_mious)) if mask_mious else 0.0
    else:
        f1s, naccs = [], []
        for b in ("decoder", "token"):
            g = acc[b]["grec"]
            m = grec_f1_nacc(g["boxes"], g["scores"], g["gts"],
                             g["targets"])
            if multi:
                # aggregate the raw counters across hosts, then recompute
                correct = m["F1_score"] / 100.0 * m["n"]
                agg = _allgather_sum(np.asarray(
                    [correct, m["n"], m["TP"], m["FN"]], np.float64))
                m["F1_score"] = agg[0] / max(agg[1], 1) * 100.0
                m["N_acc"] = (agg[2] / (agg[2] + agg[3]) * 100.0
                              if agg[2] != 0 else 0.0)
            out[f"{b}_F1_score"] = m["F1_score"]
            out[f"{b}_N_acc"] = m["N_acc"]
            f1s.append(m["F1_score"])
            naccs.append(m["N_acc"])
        # reference returns (mean F1, mean N-acc) as (det_acc, miou)
        # (apis/test.py:285-291)
        out["det_acc"] = float(np.mean(f1s))
        out["miou"] = float(np.mean(naccs))
    return out
