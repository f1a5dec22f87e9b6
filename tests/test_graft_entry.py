"""Driver-artifact regression tests (VERDICT r3 #1).

Two consecutive rounds lost their end-of-round artifacts (r01 rc=1,
r03 rc=124: the dryrun hung probing a wedged TPU backend and bench's
retry cooldowns out-slept the driver's timeout).  These tests run the
driver's actual entry points so a regression there fails CI instead of
silently voiding the next round's capture:

- ``dryrun_multichip(2)`` end-to-end on the virtual CPU mesh — the
  exact code path the MULTICHIP capture runs (tiny TP train step plus
  the flagship base/32 @640 scan+remat+TP step);
- the wedged-backend routing: a hung/short default backend must route
  to the forced-CPU child, and the bounded probe must convert a hang
  into 0 within its timeout;
- ``bench.py`` with a dead backend must print a parseable error JSON
  line well inside BENCH_DEADLINE_S, not time out silently.
"""

import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as ge  # noqa: E402


def test_dryrun_multichip_end_to_end(capsys):
    """The driver's MULTICHIP entry point, on the pytest virtual CPU
    mesh (conftest forces 8 devices): must run BOTH steps — tiny and
    flagship — and report finite losses.  In-process here (pytest env
    is already CPU-pinned), exactly the branch the forced-CPU child
    takes in the driver run."""
    ge.dryrun_multichip(2)
    out = capsys.readouterr().out
    assert "dryrun_multichip ok" in out, out
    assert "dryrun_multichip flagship ok" in out, out


def test_probe_bounds_a_hung_backend(monkeypatch):
    """A wedged backend hangs jax.devices() forever; the probe must
    turn that into 0 within its timeout instead of hanging the
    capture (the r03 failure mode)."""
    monkeypatch.setenv("_GRAFT_PROBE_CODE", "import time; time.sleep(60)")
    t0 = time.monotonic()
    assert ge._probe_default_backend(8, timeout=2.0) == 0
    assert time.monotonic() - t0 < 10


def test_probe_failure_routes_to_cpu_child(monkeypatch):
    """With the default backend unusable, dryrun_multichip must re-exec
    the forced-CPU child — never touch the backend in-process."""
    calls = {}
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("_GRAFT_DRYRUN_CHILD", raising=False)
    monkeypatch.setattr(ge, "_probe_default_backend", lambda n: 0)
    monkeypatch.setattr(
        ge, "_reexec_dryrun_child",
        lambda n, real_backend: calls.update(n=n, real=real_backend))
    ge.dryrun_multichip(8)
    assert calls == {"n": 8, "real": False}


def test_healthy_backend_routes_to_real_child(monkeypatch):
    calls = {}
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("_GRAFT_DRYRUN_CHILD", raising=False)
    monkeypatch.setattr(ge, "_probe_default_backend", lambda n: 8)
    monkeypatch.setattr(
        ge, "_reexec_dryrun_child",
        lambda n, real_backend: calls.update(n=n, real=real_backend))
    ge.dryrun_multichip(8)
    assert calls == {"n": 8, "real": True}


@pytest.mark.parametrize("deadline", [15])
def test_bench_dead_backend_emits_error_json(tmp_path, deadline):
    """bench.py against a dead backend: must exit nonzero INSIDE the
    deadline with a parseable JSON record (value 0.0 + extra.error) as
    the last stdout line — the driver archives whatever is printed, so
    an outage must never leave 'parsed: null' again."""
    fake = tmp_path / "jax.py"
    fake.write_text(
        "raise RuntimeError('UNAVAILABLE: TPU backend setup/compile "
        "error (simulated)')\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = str(tmp_path)
    env["BENCH_DEADLINE_S"] = str(deadline)
    env["BENCH_PROBE_S"] = "10"
    env.pop("BENCH_START_TS", None)
    env.pop("BENCH_REEXEC", None)
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=deadline + 60, env=env,
        cwd=REPO,
    )
    took = time.monotonic() - t0
    assert proc.returncode != 0
    assert took < deadline + 45, took
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert lines, proc.stderr[-2000:]
    rec = json.loads(lines[-1])
    assert rec["metric"] == "rec_inference_images_per_sec_per_chip"
    assert rec["value"] == 0.0
    assert "error" in rec["extra"]
    assert "UNAVAILABLE" in rec["extra"]["error"]
