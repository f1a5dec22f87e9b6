"""Checkpoint save/load with the reference's three load modes.

Reference (simvg/utils/checkpoint.py:54-150): torch.save dict
{state_dict, ema_state_dict, optimizer, scheduler, lr, epoch, metrics}
as latest.pth / det_best.pth / epoch_N.pth; load modes:
  --resume-from   full state + epoch counter
  --load-from     weights (+EMA) only
  --finetune-from weights non-strict (missing/unexpected keys logged)

TPU-native: each component (params / opt_state / ema_params) is its own
orbax item under the checkpoint directory, so partial restores (weights
only) never need the full optimizer tree; a JSON sidecar carries scalars
(epoch, metrics).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


# One shared checkpointer: saves are asynchronous (orbax streams device
# arrays in a background thread) so the train loop is not blocked; the
# only forced waits are before touching a path that may still be
# written, and in wait_for_checkpoints().
_CKPTR: Optional[ocp.StandardCheckpointer] = None
_SAVE_SEQ = 0
_FINALIZERS: list = []


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_checkpoints():
    """Block until every in-flight async save has committed AND its
    tmp-dir swap finalized."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()
    while _FINALIZERS:
        _FINALIZERS.pop().join()


def save_checkpoint(
    work_dir: str,
    name: str,
    *,
    params,
    opt_state=None,
    ema_params=None,
    epoch: int = 0,
    metrics: Optional[Dict[str, float]] = None,
    ema_step: Optional[int] = None,
    block: bool = False,
) -> str:
    global _SAVE_SEQ
    path = osp.abspath(osp.join(work_dir, name))
    ckptr = _checkpointer()
    # serialize with any in-flight save AND its swap before touching
    # directories
    wait_for_checkpoints()
    _SAVE_SEQ += 1
    tmp = f"{path}.tmp{_SAVE_SEQ}"
    if osp.exists(tmp):
        shutil.rmtree(tmp)
    items = {"params": params}
    if opt_state is not None:
        items["opt_state"] = opt_state
    if ema_params is not None:
        items["ema_params"] = ema_params
    for key, tree in items.items():
        # orbax streams device arrays directly; no host staging copy
        ckptr.save(osp.join(tmp, key), tree)

    meta = {"epoch": epoch, "metrics": metrics or {},
            # EMA warmup counter: without it, resume restarts the
            # warmup decay min(alpha,(t+1)/(t+10)) at t=0 and the
            # first post-resume update collapses the shadow ~90%
            # toward the live params
            "ema_step": ema_step,
            "items": sorted(items)}

    def _finalize():
        # Crash-safe ordering: meta.json is written only AFTER the
        # async saves commit (a dir without meta.json is never a valid
        # checkpoint — see load/latest), and the previous checkpoint is
        # deleted only after the replacement is fully on disk, so a
        # preemption mid-save always leaves an intact fallback.
        # Multi-host: every process calls save() (orbax's internal
        # barriers require it) but only process 0 performs the swap —
        # concurrent rmtree/rename from several ranks on a shared
        # work_dir would destroy the winner's checkpoint.
        ckptr.wait_until_finished()
        if jax.process_index() != 0:
            return
        with open(osp.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
        if osp.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)

    if block:
        _finalize()
    else:
        th = threading.Thread(target=_finalize, daemon=True)
        th.start()
        _FINALIZERS.append(th)
    return path


def load_checkpoint(
    path: str,
    *,
    params_template=None,
    opt_state_template=None,
    with_opt: bool = False,
    with_ema: bool = False,
) -> Dict[str, Any]:
    """Returns {"params", ["opt_state"], ["ema_params"], "epoch",
    "metrics"}.  Templates restore exact dtypes/shapes."""
    path = osp.abspath(path)
    wait_for_checkpoints()  # the path may still be being written/swapped
    ckptr = _checkpointer()

    out: Dict[str, Any] = {}
    tmpl = _to_host(params_template) if params_template is not None \
        else None
    out["params"] = ckptr.restore(osp.join(path, "params"), tmpl)
    if with_opt and osp.isdir(osp.join(path, "opt_state")):
        ot = (_to_host(opt_state_template)
              if opt_state_template is not None else None)
        out["opt_state"] = ckptr.restore(osp.join(path, "opt_state"), ot)
    if with_ema and osp.isdir(osp.join(path, "ema_params")):
        out["ema_params"] = ckptr.restore(osp.join(path, "ema_params"),
                                          tmpl)
    meta_path = osp.join(path, "meta.json")
    meta = {"epoch": 0, "metrics": {}}
    if osp.exists(meta_path):
        meta = json.load(open(meta_path))
    out["epoch"] = meta.get("epoch", 0)
    out["metrics"] = meta.get("metrics", {})
    out["ema_step"] = meta.get("ema_step")
    return out


def latest_checkpoint(work_dir: str) -> Optional[str]:
    p = osp.join(work_dir, "latest")
    # meta.json is written after the async saves commit; a dir without
    # it is a partial save, not a checkpoint
    return p if osp.isfile(osp.join(p, "meta.json")) else None
