"""Encoder perf ablation: where do the milliseconds go?

Times the flagship BEiT3-base/32 encoder forward (b=32, S=421) under a
set of one-change-at-a-time ablations so the residual between measured
throughput and the matmul roofline can be attributed.  Used to drive the
round-2 MFU work (VERDICT.md "What's weak" #5).

Run:  python tools/misc/encoder_ablation.py [--batch 32] [--iters 20]
"""

from __future__ import annotations

import argparse
import dataclasses
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder


def timed(fn, args, iters, warmup=2, inner=10):
    @jax.jit
    def run_n(*a):
        def body(i, acc):
            img = a[0] + acc * 1e-38
            out = fn(img, *a[1:])
            return acc + jnp.float32(jax.tree.leaves(out)[0].sum())

        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    for _ in range(warmup):
        float(run_n(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run_n(*args))
        times.append((time.perf_counter() - t0) / inner)
    return float(np.median(times))


def bench_encoder(cfg: BEiT3Config, batch: int, iters: int, text_len=20):
    model = BEiT3Encoder(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.normal(0, 1, (batch, cfg.img_size, cfg.img_size, 3)),
        jnp.bfloat16 if cfg.dtype == jnp.bfloat16 else jnp.float32)
    ids = jnp.asarray(rng.integers(0, 1000, (batch, text_len)), jnp.int32)
    pad = jnp.zeros((batch, text_len), jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img[:1], ids[:1], pad[:1]))
    params = jax.tree.map(
        lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape), s.dtype), shapes)

    def fwd(image, p, i, m):
        return model.apply(p, image, i, m, deterministic=True)[2].sum()

    dt = timed(fwd, (img, params, ids, pad), iters)
    return dt


def flops_encoder(cfg: BEiT3Config, batch: int, text_len=20):
    s = cfg.seq_vision + text_len
    d, f, L = cfg.embed_dim, cfg.ffn_dim, cfg.num_layers
    per_layer = 8 * s * d * d + 4 * s * s * d + 4 * s * d * f
    patchify = 2 * cfg.num_patches * d * (cfg.patch_size ** 2 * 3)
    return batch * (L * per_layer + patchify)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()

    import flax.linen as nn
    import simvg_tpu.models.beit3 as m

    orig_ln = m._ln

    def patch_ln_off():
        class _Id(nn.Module):
            @nn.compact
            def __call__(self, x):
                return x

        m._ln = lambda cfg, name: _Id(name=name)

    def patch_attn_off():
        import simvg_tpu.ops.attention as att
        orig = att.multihead_attention

        def fake(q, k, v, **kw):
            return (q + k + v).astype(kw.get("dtype", q.dtype))

        m.multihead_attention = fake
        att.multihead_attention = fake
        patch_attn_off._restore = lambda: (
            setattr(m, "multihead_attention", orig),
            setattr(att, "multihead_attention", orig))

    base = BEiT3Config.base(img_size=640, patch_size=32,
                            dtype=jnp.bfloat16, drop_path_rate=0.0,
                            scan_layers=True)
    variants = {
        "baseline_bf16_xla": (base, None),
        "pallas_attn": (dataclasses.replace(base, attn_impl="pallas"), None),
        "unrolled": (dataclasses.replace(base, scan_layers=False), None),
        "attn_off": (base, patch_attn_off),
        "gelu_exact": (dataclasses.replace(base, gelu_impl="exact"), None),
        "ln_off": (base, patch_ln_off),
        "b64": (base, None),
        "b128": (base, None),
    }
    peak = 197e12  # v5e bf16
    for name, (cfg, patch) in variants.items():
        if args.only and args.only not in name:
            continue
        batch = args.batch
        if name == "b64":
            batch = 64
        elif name == "b128":
            batch = 128
        if patch:
            patch()
        try:
            dt = bench_encoder(cfg, batch, args.iters)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}")
            continue
        finally:
            m._ln = orig_ln
            if patch is not None and hasattr(patch, "_restore"):
                patch._restore()
        fl = flops_encoder(cfg, batch)
        print(f"{name:28s} {dt*1e3:8.2f} ms  "
              f"{batch/dt:8.1f} img/s  "
              f"MFU {fl/dt/peak*100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
