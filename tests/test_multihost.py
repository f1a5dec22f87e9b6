"""2-process jax.distributed localhost test (VERDICT round-1 item #8):
the multi-host branch of tools/train.py must not be dead code. Spawns
two coordinated processes (2 virtual CPU devices each, 4 global),
assembles global batches with make_array_from_process_local_data, runs
one sharded train step and a full evaluate() pass, and asserts both
processes agree on the loss and on the cross-process-aggregated
metrics."""

import os
import os.path as osp
import re
import socket
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
WORKER = osp.join(REPO, "tests", "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_train_and_eval():
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", port],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}:\n{out[-3000:]}"

    results = [re.findall(r"RESULT (\S+) ([\d.]+)", o) for o in outs]
    assert results[0] and results[0] == results[1], results
    vals = dict((k, float(v)) for k, v in results[0])
    assert "loss_total" in vals and vals["loss_total"] > 0
    assert "det_acc" in vals  # evaluate() aggregated across processes
    # the cross-process ZeRO (fsdp) layout computes the same loss as
    # replicated DP on the identical init + global batch
    assert abs(vals["loss_total_fsdp"] - vals["loss_total"]) \
        <= 1e-3 * vals["loss_total"], vals


WORKER4 = osp.join(REPO, "tests", "_multihost4_worker.py")


def _run_eval_workers(nproc, data_root, bs):
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER4, str(i), str(nproc), port,
             data_root, str(bs)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}/{nproc}:\n{out[-3000:]}"
    results = [dict(re.findall(r"RESULT (\S+) ([\d.]+)", o))
               for o in outs]
    assert all(r == results[0] for r in results), results
    return {k: float(v) for k, v in results[0].items()}


@pytest.mark.slow
def test_four_process_uneven_shards_eval(tmp_path):
    """VERDICT r3 #5: 4 localhost processes over a REAL DataLoader with
    a split length (22) not divisible by nproc*batch (4*2=8) — so the
    last batch wrap-pads within itself AND a whole flagged duplicate
    batch pads the shard count to a multiple of 4 — plus text buckets,
    whose multi-host pin ([max]) differs from the single-process
    choice.  det_acc/miou must equal the single-process oracle exactly:
    every real sample counted once, no wrap-pad leakage, identical
    global batch content per SPMD step on every host."""
    sys.path.insert(0, osp.join(REPO, "tests"))
    from util_synth import make_refcoco_style

    make_refcoco_style(str(tmp_path), n_train=1, n_val=22)

    four = _run_eval_workers(4, str(tmp_path), bs=2)
    one = _run_eval_workers(1, str(tmp_path), bs=2)

    # 22 samples / bs 2 -> 11 real batches; 4-way sharding pads the
    # flagged list to 12 -> 3 SPMD steps per process
    assert one["steps"] == 11
    assert four["steps"] == 3
    # the crisp wrap-pad-leak detector: the aggregated REAL sample
    # count must be the split length on both topologies (a leaked
    # duplicate batch would read 24)
    assert one["n_samples"] == 22.0, one
    assert four["n_samples"] == 22.0, four
    assert four["det_acc"] == pytest.approx(one["det_acc"], abs=1e-6)
    # the 4-proc run pins the max text bucket (10) while the oracle
    # picks 6, and fp32 accumulation groups differ — allow fp wobble
    # only; a leaked batch would shift miou by ~1/12 of its mean
    assert four["miou"] == pytest.approx(one["miou"], abs=1e-3), (four,
                                                                  one)
