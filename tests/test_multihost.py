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
