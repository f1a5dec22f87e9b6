#!/usr/bin/env python
"""Production serving server: HTTP + dynamic micro-batching over one
compiled device program.

No reference analogue — the reference's serving story is the live
torch process (/root/reference/simvg/apis/inference.py:20-140); demos
call the model per image.  The TPU-native deployment shape is
different: ONE static-shape compiled program (batch padded to
``--max-batch``), a batcher thread that coalesces concurrent requests
into device batches (TPUs want large batched matmuls, not per-request
calls), and a choice of backend:

  * live:      --checkpoint  (config + orbax/converted checkpoint, jit)
  * exported:  --exported m.jaxexp  (AOT artifact from
               tools/misc/export_serving.py — no checkpoint needed;
               weights are baked into the artifact)

API (JSON over HTTP, stdlib only — no server deps at the serving site):

  GET  /healthz   -> {"status": "ok", "backend": ..., "max_batch": N}
  POST /predict   <- {"image_b64": <b64 jpeg/png>, "expression": str}
                     (or {"image_path": str} relative to --image-root;
                      disabled unless --image-root is given)
                  -> {"token":   {"box": [x0,y0,x1,y1], "score": f},
                      "decoder": {"box": [...], "score": f},
                      "batch_size": n, "latency_ms": f}
     optional "all": true adds per-query "boxes"/"scores" lists
     (GRefCOCO-style multi-target output).

Boxes are returned in ORIGINAL image coordinates (the resized-scale
prediction divided by the pipeline's scale_factor, exactly like
tools/demo.py).

Static shapes: every device batch is padded to --max-batch by
repeating the last request's sample, so the program compiles exactly
once (at startup warmup) — a request never waits on XLA.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import os.path as osp
import queue
import sys
import threading
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


class Batcher:
    """Coalesce concurrent requests into one padded device batch."""

    def __init__(self, run_batch, preproc, canvas: int, max_batch: int,
                 timeout_ms: float, request_timeout_s: float = 120.0):
        self.run_batch = run_batch
        self.preproc = preproc
        self.canvas = canvas
        self.max_batch = max_batch
        self.timeout_s = timeout_ms / 1000.0
        self.request_timeout_s = request_timeout_s
        self.q: "queue.Queue" = queue.Queue()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, img_bgr, expression: str, want_all: bool,
               timeout_s: float | None = None) -> dict:
        """Called from HTTP handler threads; blocks until the batcher
        thread has run this request's device batch.  ``timeout_s``
        overrides the default per-request timeout (the startup warmup
        passes a much larger one: the one-time XLA compile can take
        minutes on a remote-compile runtime)."""
        sample = self.preproc(img_bgr, expression,
                              filename="<request>")
        ev = threading.Event()
        slot = {"want_all": want_all}
        self.q.put((sample, ev, slot))
        if not ev.wait(timeout=timeout_s or self.request_timeout_s):
            # mark the orphaned queue item so _loop drops it instead of
            # letting a burst of abandoned requests occupy batch slots
            # and delay fresh traffic (ADVICE r3)
            slot["cancelled"] = True
            raise TimeoutError("device batch did not complete")
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["result"]

    def _get_live(self, timeout=None):
        """Next queue item whose submitter is still waiting (skips
        slots flagged cancelled by a timed-out ``submit``)."""
        while True:
            item = self.q.get(timeout=timeout)
            if not item[2].get("cancelled"):
                return item

    def _loop(self):
        while True:
            first = self._get_live()
            items = [first]
            deadline = time.monotonic() + self.timeout_s
            while len(items) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    items.append(self._get_live(timeout=left))
                except queue.Empty:
                    break
            # a submitter may have timed out while we gathered the
            # batch — drop its slot before spending device time on it
            items = [it for it in items if not it[2].get("cancelled")]
            if not items:
                continue
            try:
                self._run(items)
            except Exception as e:  # noqa: BLE001 — fan the error out
                for _, ev, slot in items:
                    slot["error"] = f"{type(e).__name__}: {e}"
                    ev.set()

    def _run(self, items):
        import numpy as np

        from simvg_tpu.data.loader import collate

        n = len(items)
        samples = [s for s, _, _ in items]
        # pad to the one compiled shape; padded rows are real forwards
        # of a repeated sample whose outputs are simply dropped
        samples = samples + [samples[-1]] * (self.max_batch - n)
        batch = collate(samples, canvas=self.canvas, max_gt=1)
        t0 = time.monotonic()
        preds = self.run_batch(batch)
        preds = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
                 for k, v in preds.items()}
        dt_ms = (time.monotonic() - t0) * 1000.0
        for i, (_, ev, slot) in enumerate(items):
            sf = batch["scale_factor"][i]
            out = {"batch_size": n, "latency_ms": round(dt_ms, 2)}
            for br in ("token", "decoder"):
                r = {
                    "box": (preds[br]["best_box"][i] / sf).tolist(),
                    "score": float(preds[br]["best_score"][i]),
                }
                if slot["want_all"]:
                    r["boxes"] = (preds[br]["boxes"][i]
                                  / sf).tolist()
                    r["scores"] = preds[br]["scores"][i].tolist()
                out[br] = r
            slot["result"] = out
            ev.set()


def _load_variables(args, cfg, img_size: int):
    """Build the model and restore serving variables (params + quant)
    — shared by the live backend and weights-as-argument artifacts."""
    import jax
    import jax.numpy as jnp

    from simvg_tpu.models.builder import build_model
    from simvg_tpu.ops.quant import attach_static_quant
    from simvg_tpu.utils.checkpoint import load_checkpoint

    dtype = jnp.bfloat16 if cfg.get("use_bf16", True) else jnp.float32
    model, _ = build_model(cfg.model, img_size=img_size, dtype=dtype)
    dummy = {
        "image": jnp.zeros((args.max_batch, img_size, img_size, 3),
                           jnp.float32),
        "text_ids": jnp.zeros((args.max_batch,
                               cfg.get("max_token", 20)), jnp.int32),
        "text_padding_mask": jnp.zeros(
            (args.max_batch, cfg.get("max_token", 20)), jnp.int32),
        "img_shape": jnp.full((args.max_batch, 2), img_size, jnp.int32),
    }
    params = dict(model.init(jax.random.PRNGKey(0), **dummy))
    quant_skel = params.pop("quant", None)
    if args.checkpoint:
        params = load_checkpoint(
            args.checkpoint, params_template=params)["params"]
    if quant_skel is not None:
        params = attach_static_quant(params, quant_skel,
                                     args.quant_collection)
    return model, params


def _build_backend(args, cfg, device_norm=None):
    """-> (run_batch(batch)->preds, backend_name, img_size).

    ``device_norm`` comes from the shared RawPreprocessor (data/raw.py)
    so the live backend and the request pipeline cannot drift on the
    normalize_on_device contract; exported artifacts have it baked."""
    import jax
    import jax.numpy as jnp

    img_size = cfg.get("img_size", 640)

    if args.exported:
        from simvg_tpu.export import SERVING_INPUTS, load_exported

        exp = load_exported(args.exported)
        # calling convention: (batch,) for a weights-baked artifact,
        # (variables, batch) for bake_weights=False (export.py:74-105)
        in_args, _ = jax.tree.unflatten(exp.in_tree,
                                        list(exp.in_avals))
        weights_as_arg = len(in_args) == 2
        batch_aval = in_args[-1]
        # a fixed-batch artifact dictates max_batch; polymorphic (dim
        # "b") serves the server's padded shape directly
        img_aval = batch_aval["image"]
        b0 = img_aval.shape[0]
        if isinstance(b0, int):
            if args.max_batch != b0:
                print(f"[serve] exported artifact has fixed batch {b0}; "
                      f"overriding --max-batch {args.max_batch} -> {b0}")
                args.max_batch = b0
        img_size = int(img_aval.shape[1])

        if weights_as_arg:
            # bake_weights=False artifact: weights are the first
            # argument — restore them from --checkpoint
            if not args.checkpoint:
                raise SystemExit(
                    f"{args.exported} was exported with "
                    "bake_weights=False (weights are an argument, not "
                    "baked constants); pass --checkpoint to restore "
                    "the weights to serve with it")
            _, variables = _load_variables(args, cfg, img_size)

            def run_batch(batch):
                return exp.call(variables,
                                {k: jnp.asarray(batch[k])
                                 for k in SERVING_INPUTS})
        else:
            def run_batch(batch):
                return exp.call({k: jnp.asarray(batch[k])
                                 for k in SERVING_INPUTS})

        return run_batch, f"exported:{osp.basename(args.exported)}", \
            img_size

    from simvg_tpu.engine.train import make_eval_step
    from simvg_tpu.export import SERVING_INPUTS

    model, params = _load_variables(args, cfg, img_size)
    step = jax.jit(make_eval_step(model, device_norm=device_norm))

    def run_batch(batch):
        return step(params, {k: jnp.asarray(batch[k])
                             for k in SERVING_INPUTS})

    name = ("live:" + osp.basename(args.checkpoint)
            if args.checkpoint else "live:random-init")
    return run_batch, name, img_size


def _decode_image(req: dict, image_root: str | None = None):
    import cv2
    import numpy as np

    if "image_b64" in req:
        raw = base64.b64decode(req["image_b64"])
        img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                           cv2.IMREAD_COLOR)
    elif "image_path" in req:
        # server-local file reads let any client with HTTP access probe
        # the filesystem (ADVICE r3) — gate them behind an explicit
        # --image-root and confine resolved paths to that directory
        if image_root is None:
            raise ValueError(
                "image_path requests are disabled; start the server "
                "with --image-root DIR to allow reads under DIR, or "
                "send image_b64")
        path = osp.realpath(osp.join(image_root, req["image_path"]))
        if not (path + os.sep).startswith(
                osp.realpath(image_root) + os.sep) \
                and path != osp.realpath(image_root):
            raise ValueError("image_path escapes --image-root")
        img = cv2.imread(path, cv2.IMREAD_COLOR)
    else:
        raise ValueError("request needs image_b64 or image_path")
    if img is None:
        raise ValueError("could not decode image")
    return img


def main():
    p = argparse.ArgumentParser(description="simvg_tpu serving server")
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--exported", default=None,
                   help=".jaxexp from tools/misc/export_serving.py "
                        "(weights baked in; --checkpoint ignored)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8900)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--batch-timeout-ms", type=float, default=10.0,
                   help="how long the batcher waits to coalesce "
                        "requests before running a partial batch")
    p.add_argument("--request-timeout-s", type=float, default=120.0,
                   help="per-request wait for the device batch")
    p.add_argument("--warmup-timeout-s", type=float, default=1800.0,
                   help="wait for the one-time startup compile (a "
                        "remote XLA compiler can take minutes on the "
                        "flagship program)")
    p.add_argument("--image-root", default=None,
                   help="allow {'image_path': ...} requests, resolved "
                        "under (and confined to) this directory; "
                        "disabled by default — clients send image_b64")
    p.add_argument("--quant-collection", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from simvg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # repeated invocations skip recompiles
    import numpy as np

    from simvg_tpu.config import Config, parse_cfg_options

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(parse_cfg_options(args.cfg_options))

    from simvg_tpu.data.raw import RawPreprocessor

    preproc = RawPreprocessor(cfg)
    run_batch, backend, img_size = _build_backend(
        args, cfg, device_norm=preproc.device_norm)
    batcher = Batcher(run_batch, preproc, canvas=img_size,
                      max_batch=args.max_batch,
                      timeout_ms=args.batch_timeout_ms,
                      request_timeout_s=args.request_timeout_s)

    # warmup: compile the one static shape before accepting traffic
    t0 = time.monotonic()
    warm = np.zeros((img_size, img_size, 3), np.uint8)
    batcher.submit(warm, "warmup", want_all=False,
                   timeout_s=args.warmup_timeout_s)
    print(f"[serve] warmup compile {time.monotonic() - t0:.1f}s "
          f"(backend={backend}, max_batch={args.max_batch}, "
          f"img_size={img_size})")

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet access log
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "backend": backend,
                                 "max_batch": args.max_batch,
                                 "img_size": img_size})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/predict":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                img = _decode_image(req, image_root=args.image_root)
                expr = req["expression"]
            except Exception as e:  # noqa: BLE001
                self._json(400, {"error": f"bad request: {e}"})
                return
            try:
                out = batcher.submit(img, expr,
                                     want_all=bool(req.get("all")))
                self._json(200, out)
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": str(e)})

    srv = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"[serve] listening on http://{args.host}:{srv.server_port} "
          f"(POST /predict)", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
