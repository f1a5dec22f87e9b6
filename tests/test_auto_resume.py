"""E2E: crash recovery via --auto-resume (SURVEY.md §5 "Failure
detection / recovery"; reference equivalent is manual
`--resume-from latest.pth`, /root/reference/tools/train.py:31,106-107).

A 1-epoch run leaves <work_dir>/latest; re-launching the SAME command
with --auto-resume and a higher max_epoch must pick it up (log line,
training continues at epoch 2, epoch-1 metrics not re-emitted)."""

import json
import os
import subprocess
import sys

from util_synth import make_refcoco_style

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _train(work, root, max_epoch):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "tools/train.py", "configs/smoke/tiny_synth.py",
        "--platform", "cpu", "--work-dir", str(work), "--auto-resume",
        "--cfg-options",
        f"scheduler_config.max_epoch={max_epoch}",
        "evaluate_interval=5", "ema=False", "data.samples_per_gpu=2",
        f"data.train.annsfile={root}/instances.json",
        f"data.train.imgsfile={root}/images",
        f"data.val.annsfile={root}/instances.json",
        f"data.val.imgsfile={root}/images",
    ]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc


def test_auto_resume(tmp_path):
    root = tmp_path / "synth"
    # >= samples_per_gpu(2) x 8 virtual chips, or the loader is empty
    make_refcoco_style(str(root), n_train=32, n_val=4)
    work = tmp_path / "work"

    # first launch: trains epoch 1 only, leaves <work>/latest
    _train(work, root, max_epoch=1)
    assert (work / "latest").exists()
    epochs1 = {m["epoch"] for m in map(
        json.loads, open(work / "metrics.jsonl"))
        if m.get("kind") == "train"}
    assert epochs1 == {1}, epochs1

    # relaunch (simulating restart after preemption) with 2 epochs:
    # must auto-resume from latest and run ONLY epoch 2
    proc = _train(work, root, max_epoch=2)
    logs = proc.stdout + proc.stderr
    assert "auto-resume" in logs, logs[-800:]
    epochs2 = {m["epoch"] for m in map(
        json.loads, open(work / "metrics.jsonl"))
        if m.get("kind") == "train"}
    assert 2 in epochs2, epochs2

    # epoch 1 was not retrained in the second launch: the epoch-1
    # train lines were written once (by the first run only)
    lines = [m for m in map(json.loads, open(work / "metrics.jsonl"))
             if m.get("kind") == "train" and m["epoch"] == 1]
    iters = [m["iter"] for m in lines]
    assert len(iters) == len(set(iters)), "epoch 1 re-trained"


def test_latest_interval_throttle(tmp_path):
    """latest_interval=N throttles the full-opt-state crash-recovery
    checkpoint (1-core hosts: its serialization dominates short epochs)
    while the FINAL epoch always saves — the two-stage --load-from
    contract depends on <work_dir>/latest existing at max_epoch."""
    import shutil

    root = tmp_path / "synth"
    make_refcoco_style(str(root), n_train=32, n_val=4)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"

    def train(work, max_epoch, interval):
        cmd = [
            sys.executable, "tools/train.py",
            "configs/smoke/tiny_synth.py",
            "--platform", "cpu", "--work-dir", str(work),
            "--cfg-options",
            f"scheduler_config.max_epoch={max_epoch}",
            f"latest_interval={interval}",
            "evaluate_interval=10", "ema=False",
            "data.samples_per_gpu=2",
            f"data.train.annsfile={root}/instances.json",
            f"data.train.imgsfile={root}/images",
            f"data.val.annsfile={root}/instances.json",
            f"data.val.imgsfile={root}/images",
        ]
        proc = subprocess.run(cmd, cwd=REPO, env=env,
                              capture_output=True, text=True,
                              timeout=900)
        assert proc.returncode == 0, proc.stderr[-3000:]

    # max_epoch=3 with interval=2: epoch 2 saves, epoch 3 (final)
    # saves unconditionally -> latest records epoch 3
    work = tmp_path / "work"
    train(work, max_epoch=3, interval=2)
    assert (work / "latest").exists()
    import json as _json

    meta = _json.loads((work / "latest" / "meta.json").read_text())
    assert meta["epoch"] == 3, meta

    # max_epoch=1 with a huge interval: the final-epoch save still
    # fires (otherwise a 1-epoch stage-1 run would leave nothing for
    # stage 2 to load)
    work2 = tmp_path / "work2"
    train(work2, max_epoch=1, interval=100)
    assert (work2 / "latest").exists()
    shutil.rmtree(work2)
