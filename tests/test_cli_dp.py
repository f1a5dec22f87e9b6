"""E2E: tools/train.py must data-parallelize over local devices in a
SINGLE process (the standard TPU topology; reference equivalent is 8-GPU
DDP, /root/reference/tools/train.py:102-103).

Asserts (a) the global batch is sharded over the mesh's "data" axis, and
(b) the dp=8 global-batch step computes the same loss as a 1-device run
on the identical global batch.
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

from util_synth import make_refcoco_style

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(work_dir, synth_root, spg, ndev):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev}"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "tools/train.py", "configs/smoke/tiny_synth.py",
        "--platform", "cpu", "--work-dir", str(work_dir),
        "--cfg-options",
        f"data.samples_per_gpu={spg}",
        "scheduler_config.max_epoch=1",
        "evaluate_interval=5",
        "ema=False",
        f"data.train.annsfile={synth_root}/instances.json",
        f"data.train.imgsfile={synth_root}/images",
        f"data.val.annsfile={synth_root}/instances.json",
        f"data.val.imgsfile={synth_root}/images",
    ]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    log = [f for f in os.listdir(work_dir) if f.endswith("_train_log.txt")]
    text = open(os.path.join(work_dir, log[0])).read()
    metrics = [json.loads(line) for line in
               open(os.path.join(work_dir, "metrics.jsonl"))]
    return text, metrics


@pytest.mark.slow
def test_single_process_dp_shards_batch_and_matches_1dev(tmp_path):
    synth = tmp_path / "synth"
    make_refcoco_style(str(synth), n_train=8, n_val=4)

    # 8 devices x spg=1 and 1 device x spg=8: SAME global batch of 8
    text8, m8 = _run_cli(tmp_path / "dp8", synth, spg=1, ndev=8)
    text1, m1 = _run_cli(tmp_path / "dp1", synth, spg=8, ndev=1)

    assert re.search(r"mesh: \{'data': 8", text8), text8[:2000]
    m = re.search(r"global batch image: shape=\((\d+),.*"
                  r"spec=PartitionSpec\('data',?\)", text8)
    assert m, "batch not sharded on the data axis"
    assert int(m.group(1)) == 8  # global batch, not per-chip

    first8 = next(x for x in m8 if x["kind"] == "train")
    first1 = next(x for x in m1 if x["kind"] == "train")
    np.testing.assert_allclose(first8["loss_total"],
                               first1["loss_total"], rtol=2e-3)


@pytest.mark.slow
def test_train_cli_int8_qat_e2e(tmp_path):
    """Quantization-aware training through the real CLI: one epoch
    with model.vis_enc.quant=int8_qat (fake-quant + STE — the only
    quant mode the training guard admits), loss finite, checkpoint
    written with the standard param layout (serves with int8_static)."""
    synth = tmp_path / "synth"
    make_refcoco_style(str(synth), n_train=8, n_val=4)
    work = tmp_path / "qat"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "tools/train.py", "configs/smoke/tiny_synth.py",
        "--platform", "cpu", "--work-dir", str(work),
        "--cfg-options",
        "model.vis_enc.quant=int8_qat",
        # conftest exports 8 virtual CPU devices; keep the global
        # batch (spg x 8) within the 8-sample synthetic split
        "data.samples_per_gpu=1",
        "scheduler_config.max_epoch=1",
        "evaluate_interval=5",
        "ema=False",
        f"data.train.annsfile={synth}/instances.json",
        f"data.train.imgsfile={synth}/images",
        f"data.val.annsfile={synth}/instances.json",
        f"data.val.imgsfile={synth}/images",
    ]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics = [json.loads(line) for line in
               open(os.path.join(work, "metrics.jsonl"))]
    train = [m for m in metrics if m.get("kind") == "train"]
    assert train and all(
        m["loss_total"] > 0 and m["loss_total"] < 1e4 for m in train)
    assert os.path.isdir(os.path.join(work, "latest"))
