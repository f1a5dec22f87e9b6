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
) -> Dict[str, float]:
    """Returns per-branch metrics + the reference's summary scalar pair
    (mean det_acc over branches; for GRec (F1, N-acc)).

    put_fn: optional transform placing the device batch (e.g. sharded
    over the mesh's data axis, or assembled into global arrays on
    multi-host) before the jitted step."""
    step = eval_step or jax.jit(make_eval_step(model))

    acc: Dict[str, Dict] = {
        b: {"iou_hits": 0, "iou_sum": 0.0, "n": 0,
            "grec": {"boxes": [], "scores": [], "gts": [], "targets": []}}
        for b in ("decoder", "token")
    }

    batches = len(loader)
    for bi, batch in enumerate(loader):
        device_batch = {
            k: v for k, v in batch.items() if k != "meta"
        }
        if put_fn is not None:
            device_batch = put_fn(device_batch)
        preds = step(params, device_batch)
        valid = np.asarray(batch["batch_valid"])

        for branch in ("decoder", "token"):
            p = preds[branch]
            if not is_grec:
                m = detection_accuracy(
                    np.asarray(p["best_box"]),
                    batch["gt_boxes"][:, 0, :],
                    valid,
                )
                a = acc[branch]
                a["iou_hits"] += m["det_acc"] / 100.0 * m["n"]
                a["iou_sum"] += m["miou"] / 100.0 * m["n"]
                a["n"] += m["n"]
            else:
                g = acc[branch]["grec"]
                boxes = np.asarray(p["boxes"])
                scores = np.asarray(p["scores"])
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

    out: Dict[str, float] = {}
    if not is_grec:
        for b in ("decoder", "token"):
            n = max(acc[b]["n"], 1)
            out[f"{b}_det_acc"] = acc[b]["iou_hits"] / n * 100.0
            out[f"{b}_miou"] = acc[b]["iou_sum"] / n * 100.0
        out["det_acc"] = (out["decoder_det_acc"]
                          + out["token_det_acc"]) / 2.0
        out["miou"] = 0.0
    else:
        f1s, naccs = [], []
        for b in ("decoder", "token"):
            g = acc[b]["grec"]
            m = grec_f1_nacc(g["boxes"], g["scores"], g["gts"],
                             g["targets"])
            out[f"{b}_F1_score"] = m["F1_score"]
            out[f"{b}_N_acc"] = m["N_acc"]
            f1s.append(m["F1_score"])
            naccs.append(m["N_acc"])
        # reference returns (mean F1, mean N-acc) as (det_acc, miou)
        # (apis/test.py:285-291)
        out["det_acc"] = float(np.mean(f1s))
        out["miou"] = float(np.mean(naccs))
    return out
