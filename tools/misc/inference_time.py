#!/usr/bin/env python
"""Latency / throughput / FLOPs profiling (reference
tools/misc/inference_time.py:1-81: warmup + timed loop + thop
MACs/params).  TPU version: jitted dual-branch forward, per-iteration
host sync, p50/p90 latency, images/sec, analytic FLOPs from the XLA cost
analysis, and an optional jax.profiler trace for xprof."""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--platform", default=None)
    p.add_argument("--trace-dir", default=None,
                   help="write a jax.profiler trace here (view in xprof)")
    args = p.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from simvg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # repeated invocations skip recompiles
    import jax.numpy as jnp

    from simvg_tpu.models.builder import build_model
    from simvg_tpu.models.model import decode_predictions

    if args.config:
        from simvg_tpu.config import Config

        cfg = Config.fromfile(args.config)
        img_size = cfg.get("img_size", 640)
        dtype = jnp.bfloat16 if cfg.get("use_bf16", True) else jnp.float32
        model, _ = build_model(cfg.model, img_size=img_size, dtype=dtype)
        t = cfg.get("max_token", 20)
    else:  # flagship default
        img_size, t = 640, 20
        model, _ = build_model(
            {"vis_enc": {"vit_type": "base", "patch_size": 32,
                         "img_size": img_size},
             "head": {"num_queries": 1, "in_channels": 768}},
            img_size=img_size, dtype=jnp.bfloat16,
        )

    b = args.batch_size
    r = np.random.default_rng(0)
    batch = dict(
        image=jnp.asarray(r.normal(size=(b, img_size, img_size, 3)),
                          jnp.float32),
        text_ids=jnp.asarray(r.integers(1, 100, (b, t)), jnp.int32),
        text_padding_mask=jnp.zeros((b, t), jnp.int32),
        img_shape=jnp.full((b, 2), img_size, jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)
    n_params = sum(x.size for x in jax.tree.leaves(params))

    @jax.jit
    def infer(params, image, text_ids, text_padding_mask, img_shape):
        out = model.apply(params, image=image, text_ids=text_ids,
                          text_padding_mask=text_padding_mask,
                          img_shape=img_shape, deterministic=True)
        return decode_predictions(out["class_token"][-1],
                                  out["bbox_token"][-1], img_shape)

    a = (params, batch["image"], batch["text_ids"],
         batch["text_padding_mask"], batch["img_shape"])

    lowered = infer.lower(*a)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        flops = cost.get("flops", float("nan"))
    except Exception:
        flops = float("nan")

    for _ in range(args.warmup):
        float(infer(*a)["best_score"].sum())

    lat = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        float(infer(*a)["best_score"].sum())
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat) * 1e3

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                float(infer(*a)["best_score"].sum())
        print(f"trace written to {args.trace_dir}")

    print(f"params: {n_params / 1e6:.2f}M")
    print(f"flops/batch (XLA cost analysis): {flops / 1e9:.2f} GFLOP")
    print(f"batch={b} iters={args.iters}")
    print(f"latency p50: {np.percentile(lat, 50):.2f} ms  "
          f"p90: {np.percentile(lat, 90):.2f} ms  "
          f"mean: {lat.mean():.2f} ms")
    print(f"throughput: {b / (lat.mean() / 1e3):.1f} images/sec")


if __name__ == "__main__":
    main()
