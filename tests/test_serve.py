"""Serving server (tools/serve.py): HTTP + dynamic micro-batching over
one compiled padded-batch program — live-checkpoint and AOT-exported
backends.  No reference analogue (the reference serves from the live
torch process, simvg/apis/inference.py)."""

import base64
import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = "configs/smoke/tiny_synth.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _start_server(extra, port):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "tools/serve.py", CFG, "--platform", "cpu",
         "--port", str(port), "--max-batch", "4",
         "--batch-timeout-ms", "40"] + extra,
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    # Drain stdout continuously on a thread: a server that logs more
    # than the 64 KB pipe buffer before binding (e.g. XLA warning spew)
    # would otherwise block mid-write and never become healthy.
    out_lines = []

    def _drain():
        for line in proc.stdout:
            out_lines.append(line)
        proc.stdout.close()

    threading.Thread(target=_drain, daemon=True).start()
    # wait for warmup + listen line
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            raise AssertionError("server died:\n" + "".join(out_lines))
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=2) as r:
                if json.loads(r.read())["status"] == "ok":
                    return proc
        except Exception:  # noqa: BLE001
            time.sleep(1.0)
    proc.kill()
    raise AssertionError("server never became healthy:\n"
                         + "".join(out_lines[-200:]))


def _jpg_b64(seed=0, size=80):
    import cv2

    r = np.random.default_rng(seed)
    img = r.integers(0, 255, (size, size, 3), np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return base64.b64encode(buf.tobytes()).decode()


def _post(port, payload, timeout=60):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _check_prediction(out, size=80):
    for br in ("token", "decoder"):
        box = out[br]["box"]
        assert len(box) == 4
        assert all(np.isfinite(box))
        # original-image coordinates (the 80px request image, not the
        # 64px model canvas)
        assert max(box) <= size + 1e-3
        assert isinstance(out[br]["score"], float)
    assert out["batch_size"] >= 1


@pytest.fixture(scope="module")
def live_server():
    port = _free_port()
    proc = _start_server([], port)
    yield port
    proc.kill()
    proc.wait()


def test_serve_predict_and_errors(live_server):
    port = live_server
    status, out = _post(port, {"image_b64": _jpg_b64(),
                               "expression": "the red box"})
    assert status == 200, out
    _check_prediction(out)

    # "all": true adds GRefCOCO-style per-query lists
    status, out = _post(port, {"image_b64": _jpg_b64(1),
                               "expression": "everything", "all": True})
    assert status == 200
    assert len(out["token"]["boxes"]) == len(out["token"]["scores"])

    # malformed requests are 400s, not server crashes; image_path is
    # DENIED by default (server started without --image-root) so a
    # client cannot read server-local files (ADVICE r3)
    for bad in ({"expression": "no image"},
                {"image_b64": "!!notbase64", "expression": "x"},
                {"image_path": "/etc/passwd", "expression": "x"}):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps(bad).encode())
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

    # still healthy afterwards
    status, out = _post(port, {"image_b64": _jpg_b64(2),
                               "expression": "still up"})
    assert status == 200


def test_serve_dynamic_batching(live_server):
    """Concurrent requests coalesce into one device batch."""
    port = live_server
    results = [None] * 6

    def hit(i):
        results[i] = _post(port, {"image_b64": _jpg_b64(i),
                                  "expression": f"object {i}"},
                           timeout=120)

    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    sizes = []
    for status, out in results:
        assert status == 200
        _check_prediction(out)
        sizes.append(out["batch_size"])
    # 6 requests through a max-batch-4 server: at least one device
    # batch carried more than one request
    assert max(sizes) > 1, sizes


def test_serve_weights_as_argument_artifact(tmp_path):
    """A bake_weights=False artifact (weights are an argument, not
    baked constants) must demand --checkpoint with an actionable error,
    and serve bit-identically to the live eval step once given one."""
    import argparse

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import serve as serve_mod
    from simvg_tpu.config import Config
    from simvg_tpu.engine.train import make_eval_step
    from simvg_tpu.export import export_serving, save_exported
    from simvg_tpu.models.builder import build_model
    from simvg_tpu.utils.checkpoint import save_checkpoint

    cfg = Config.fromfile(os.path.join(REPO, CFG))
    img_size = cfg.get("img_size", 64)
    max_batch = 2
    model, _ = build_model(cfg.model, img_size=img_size,
                           dtype=jnp.float32)
    t = cfg.get("max_token", 20)
    dummy = dict(
        image=jnp.zeros((max_batch, img_size, img_size, 3),
                        jnp.float32),
        text_ids=jnp.zeros((max_batch, t), jnp.int32),
        text_padding_mask=jnp.zeros((max_batch, t), jnp.int32),
        img_shape=jnp.full((max_batch, 2), img_size, jnp.int32))
    variables = dict(model.init(jax.random.PRNGKey(1), **dummy))
    exp = export_serving(model, variables, dummy, platforms=("cpu",),
                         bake_weights=False)
    f = str(tmp_path / "wa.jaxexp")
    save_exported(f, exp)

    args = argparse.Namespace(exported=f, checkpoint=None, max_batch=2,
                              quant_collection=None)
    with pytest.raises(SystemExit, match="bake_weights=False"):
        serve_mod._build_backend(args, cfg)

    args.checkpoint = save_checkpoint(str(tmp_path), "ckpt",
                                      params=variables, block=True)
    run_batch, name, size = serve_mod._build_backend(args, cfg)
    assert name.startswith("exported:") and size == img_size
    out = run_batch({k: np.asarray(v) for k, v in dummy.items()})
    direct = jax.jit(make_eval_step(model))(variables, dummy)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_serve_exported_backend(tmp_path):
    """--exported: serve the AOT artifact (fixed batch 4 overrides
    --max-batch; no checkpoint or model code needed at runtime)."""
    out = str(tmp_path / "m.jaxexp")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    from util_synth import make_refcoco_style

    root = tmp_path / "synth"
    make_refcoco_style(str(root), n_train=2, n_val=2)
    proc = subprocess.run(
        [sys.executable, "tools/misc/export_serving.py", CFG,
         "--platform", "cpu", "--target-platforms", "cpu",
         "--batch-size", "4", "--out", out, "--cfg-options",
         f"data.val.annsfile={root}/instances.json",
         f"data.val.imgsfile={root}/images"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]

    port = _free_port()
    server = _start_server(["--exported", out, "--max-batch", "2"],
                           port)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
            h = json.loads(r.read())
        assert h["backend"].startswith("exported:")
        assert h["max_batch"] == 4  # artifact's fixed batch wins
        status, res = _post(port, {"image_b64": _jpg_b64(9),
                                   "expression": "exported"})
        assert status == 200, res
        _check_prediction(res)
    finally:
        server.kill()
        server.wait()


def test_decode_image_path_gate(tmp_path):
    """--image-root semantics (ADVICE r3): disabled by default, paths
    resolved under the root, traversal outside it rejected."""
    import cv2

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import serve

    img = np.zeros((8, 8, 3), np.uint8)
    sub = tmp_path / "imgs"
    sub.mkdir()
    cv2.imwrite(str(sub / "a.jpg"), img)

    # default: no local reads at all
    with pytest.raises(ValueError, match="disabled"):
        serve._decode_image({"image_path": str(sub / "a.jpg")})

    # allowed under the root, relative resolution
    out = serve._decode_image({"image_path": "a.jpg"},
                              image_root=str(sub))
    assert out.shape == (8, 8, 3)

    # traversal out of the root is rejected even via ../
    (tmp_path / "secret.jpg").write_bytes(b"x")
    with pytest.raises(ValueError, match="escapes"):
        serve._decode_image({"image_path": "../secret.jpg"},
                            image_root=str(sub))
    with pytest.raises(ValueError, match="escapes"):
        serve._decode_image({"image_path": "/etc/passwd"},
                            image_root=str(sub))
