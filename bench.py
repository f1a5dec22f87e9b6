"""Benchmark: REC throughput (images/sec/chip) on the SimVG models.

Prints ONE JSON line.  Primary metric (the round-over-round scoreboard
number): flagship BEiT3-base/32 @640 dual-branch inference.  The same
line carries an ``extra`` object with the accuracy-bearing config
(ViT-L/32, the model-zoo table backbone — reference README.md:195-245)
and the full train-step throughput (fwd+bwd+optimizer+EMA), per
VERDICT r1 "Bench the accuracy-bearing config too".

Baseline note (labeled per VERDICT): the reference publishes NO
latency/throughput numbers in-repo (BASELINE.md; its only perf tool is
tools/misc/inference_time.py).  ``vs_baseline`` is therefore computed
against a documented ESTIMATE of the reference's GPU throughput:
~120 images/sec on an RTX3090 for ViT-B/32 @640 batch inference
(fp32 torch, dual-branch).  Replace when a measured reference number
exists.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_IMAGES_PER_SEC_ESTIMATE = 120.0  # estimate — see module docstring
BATCH = 32
ITERS = 20
WARMUP = 2


def _random_params(model, batch, rng_seed=0):
    """Random params generated ON DEVICE.  Host-side numpy + device_put
    moved ~1 GB per model through the tunnelled runtime (~5 MB/s) and
    dominated the whole bench wall time; one jitted RNG program leaves
    the tunnel out of it entirely."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            image=batch["image"][:1],
            text_ids=batch["text_ids"][:1],
            text_padding_mask=batch["text_padding_mask"][:1],
            img_shape=batch["img_shape"][:1],
        )
    )
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def make():
        key = jax.random.PRNGKey(rng_seed)
        out = []
        for i, s in enumerate(leaves):
            k = jax.random.fold_in(key, i)
            if jnp.issubdtype(s.dtype, jnp.floating):
                v = (jax.random.normal(k, s.shape, jnp.float32)
                     * 0.02).astype(s.dtype)
            else:
                v = jnp.zeros(s.shape, s.dtype)
            out.append(v)
        return out

    return jax.tree_util.tree_unflatten(treedef, make())


def _device_batch(b, t, img, rng=0, with_gt=False):
    """Synthetic device batch built on device (images via on-device RNG
    — a [32,640,640,3] f32 canvas is 157 MB through the tunnel
    otherwise; the small integer arrays stay host-built)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _batch

    small = _batch(1, t, 8, rng=rng)  # tiny template (gt built below)
    out = {k: jnp.asarray(np.repeat(v, b, axis=0))
           for k, v in small.items() if k not in ("image", "img_shape")}
    out["image"] = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(rng),
                                  (b, img, img, 3), jnp.float32))()
    out["img_shape"] = jnp.full((b, 2), img, jnp.int32)
    if with_gt:
        r = np.random.default_rng(rng)
        xy = r.uniform(5, img // 2, (b, 1, 2))
        wh = r.uniform(5, img // 2, (b, 1, 2))
        out["gt_boxes"] = jnp.asarray(
            np.concatenate([xy, xy + wh], -1).astype(np.float32))
        out["gt_labels"] = jnp.zeros((b, 1), jnp.int32)
        out["gt_valid"] = jnp.ones((b, 1), bool)
    return out


def _timed_loop(step_to_scalar, warmup=WARMUP):
    """Wall-time of one post-warmup call.  The iteration count lives
    INSIDE the fused executable (fori_loop), so a single dispatch times
    all iterations at once — host round trips over the tunnelled
    runtime are ~10s of ms and must not be in the measured window."""
    for _ in range(warmup):
        float(step_to_scalar())
    t0 = time.perf_counter()
    float(step_to_scalar())
    return time.perf_counter() - t0


def bench_inference(model, batch, iters=ITERS, branches="both",
                    params=None):
    import jax
    import jax.numpy as jnp

    from simvg_tpu.models.model import decode_predictions

    if params is None:
        params = _random_params(model, batch)
    branch_list = (("decoder", "class_decoder", "bbox_decoder"),
                   ("token", "class_token", "bbox_token"))
    if branches != "both":
        branch_list = tuple(bl for bl in branch_list
                            if bl[0] == branches)

    def one_pass(params, image, text_ids, text_padding_mask, img_shape):
        out = model.apply(
            params,
            image=image,
            text_ids=text_ids,
            text_padding_mask=text_padding_mask,
            img_shape=img_shape,
            deterministic=True,
            branches=branches,
        )
        preds = {
            name: decode_predictions(out[ck][-1], out[bk][-1], img_shape)
            for name, ck, bk in branch_list
        }
        return sum(preds[name]["best_score"].sum()
                   for name, _, _ in branch_list)

    @jax.jit
    def infer_n(params, image, text_ids, text_padding_mask, img_shape):
        # the carry perturbs the input infinitesimally so XLA cannot
        # hoist the loop body as loop-invariant
        def body(i, acc):
            s = one_pass(params, image + acc * 1e-38, text_ids,
                         text_padding_mask, img_shape)
            return acc + s

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    args = (params, batch["image"], batch["text_ids"],
            batch["text_padding_mask"], batch["img_shape"])
    dt = _timed_loop(lambda: infer_n(*args))
    b = batch["image"].shape[0]
    return b * iters / dt


def bench_train_step(model, batch, iters=8):
    """Full training step: loss (both branches + balanced distill),
    backward, global-norm clip, AdamW update, EMA — the hot loop of
    tools/train.py."""
    import jax
    import jax.numpy as jnp

    from simvg_tpu.engine import (
        create_optimizer,
        create_train_state,
        make_train_step,
    )

    params = _random_params(model, batch)
    tx = create_optimizer(1e-4, steps_per_epoch=100)
    state = create_train_state(params, tx, ema=True)
    step_fn = make_train_step(
        model,
        tx,
        branch_loss_weight={
            "decoder": 1.0,
            "balanced_distill": {"token": 2.0, "distill": 1.0},
        },
        ema_alpha=0.999,
        dp_size=1,
    )

    @jax.jit
    def train_n(state, batch, key):
        def body(i, carry):
            st, acc = carry
            st, scal = step_fn(
                st,
                {**batch, "image": batch["image"] + acc * 1e-38},
                jax.random.fold_in(key, i),
            )
            return st, acc + scal["loss_total"].astype(jnp.float32)

        _, acc = jax.lax.fori_loop(0, iters, body,
                                   (state, jnp.float32(0.0)))
        return acc

    key = jax.random.PRNGKey(0)
    dt = _timed_loop(lambda: train_n(state, batch, key))
    b = batch["image"].shape[0]
    return b * iters / dt


def crosscheck_pallas_vs_xla(batch, train_batch):
    """On-device numerical cross-check of the fused Pallas attention
    against the XLA path (VERDICT r2 weak #1): the Pallas kernel is the
    flagship default but CI can only run it in interpret mode — Mosaic
    compilation on the real chip is a different code path.  Runs one
    flagship forward AND one grad step through both impls with shared
    params and returns the max-abs diffs; raises if they exceed
    tolerance so a silent on-device miscompile fails the bench loudly.
    """
    import jax
    import jax.numpy as jnp

    from simvg_tpu.models import SimVGModel, SimVGConfig
    from simvg_tpu.models.beit3 import BEiT3Config
    from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig

    def flagship(impl, scan=False, remat=False):
        return SimVGModel(SimVGConfig(
            beit3=BEiT3Config.base(img_size=640, patch_size=32,
                                   dtype=jnp.bfloat16, attn_impl=impl,
                                   scan_layers=scan, remat=remat),
            head=TGQSHeadConfig(in_channels=768, dtype=jnp.bfloat16),
        ))

    out_keys = ("class_decoder", "bbox_decoder", "class_token",
                "bbox_token")

    # ---- forward: inference path (non-scan, the bench primary)
    params = _random_params(flagship("xla"), batch)
    fwd = {}
    for impl in ("pallas", "xla"):
        m = flagship(impl)

        @jax.jit
        def f(p, image, text_ids, text_padding_mask, img_shape, m=m):
            return m.apply(p, image=image, text_ids=text_ids,
                           text_padding_mask=text_padding_mask,
                           img_shape=img_shape, deterministic=True)

        fwd[impl] = {k: np.asarray(v, np.float32) for k, v in f(
            params, batch["image"], batch["text_ids"],
            batch["text_padding_mask"], batch["img_shape"]).items()
            if k in out_keys}
    fwd_diff = max(float(np.abs(fwd["pallas"][k] - fwd["xla"][k]).max())
                   for k in out_keys)

    # ---- one grad step: train layout (scan + remat), custom-VJP bwd
    grad_params = _random_params(flagship("xla", scan=True, remat=True),
                                 train_batch)
    gdiff, gscale = 0.0, 0.0
    grads = {}
    for impl in ("pallas", "xla"):
        m = flagship(impl, scan=True, remat=True)

        @jax.jit
        def g(p, image, text_ids, text_padding_mask, img_shape, m=m):
            def loss(p):
                o = m.apply(p, image=image, text_ids=text_ids,
                            text_padding_mask=text_padding_mask,
                            img_shape=img_shape, deterministic=True)
                return sum(jnp.mean(jnp.abs(o[k].astype(jnp.float32)))
                           for k in out_keys)

            return jax.grad(loss)(p)

        # keep grads ON DEVICE: fetching two ~1 GB gradient trees
        # through the tunnelled runtime would dominate the bench
        grads[impl] = g(grad_params, train_batch["image"],
                        train_batch["text_ids"],
                        train_batch["text_padding_mask"],
                        train_batch["img_shape"])

    @jax.jit
    def _maxdiff(ga, gb):
        d, s = jnp.float32(0.0), jnp.float32(0.0)
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            a32 = a.astype(jnp.float32)
            b32 = b.astype(jnp.float32)
            d = jnp.maximum(d, jnp.abs(a32 - b32).max())
            s = jnp.maximum(s, jnp.abs(b32).max())
        return d, s

    gdiff, gscale = map(float, _maxdiff(grads["pallas"], grads["xla"]))
    grad_rel = gdiff / max(gscale, 1e-12)

    result = {
        "pallas_vs_xla_max_abs": round(fwd_diff, 6),
        "pallas_vs_xla_grad_max_abs": round(gdiff, 6),
        "pallas_vs_xla_grad_rel": round(grad_rel, 6),
    }
    # bf16 forward at dim 768 / 12 layers: genuine impl-order noise is
    # well under 1e-2 on logits/boxes; a miscompile is orders larger
    if fwd_diff > 1e-2 or grad_rel > 5e-2:
        raise AssertionError(
            f"Pallas/XLA on-device divergence: {result}")
    return result


def _retry(fn, attempts=3, label=""):
    """The axon remote compiler intermittently returns HTTP 500 on large
    programs; one retry usually succeeds (the service recovers)."""
    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            last = e
            # stderr: stdout must stay the single JSON line
            print(f"# bench retry {label} {i + 1}/{attempts}: "
                  f"{type(e).__name__}", file=sys.stderr, flush=True)
            time.sleep(10)
    raise last


def main():
    import os

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the remote compiler costs minutes
    # per midsize program through the tunnel; warmed by dev runs so the
    # driver's end-of-round run reuses the executables.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:  # noqa: BLE001 - older jax knob names
        pass

    from __graft_entry__ import _batch, _flagship
    from simvg_tpu.models import SimVGModel, SimVGConfig
    from simvg_tpu.models.beit3 import BEiT3Config
    from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig

    n_chips = max(jax.device_count(), 1)

    # 0) on-device Pallas<->XLA numerical cross-check (fwd + grad);
    # raises on divergence — the shipped default's numerics are proven
    # where they actually execute, not just in interpret mode
    check_batch = _device_batch(4, 20, 640, rng=7)
    grad_batch = _device_batch(4, 20, 640, rng=8)
    extra = {}
    extra.update(_retry(
        lambda: crosscheck_pallas_vs_xla(check_batch, grad_batch),
        label="crosscheck"))

    # 1) flagship base/32 inference — the primary scoreboard metric
    model, _, t, cfg = _flagship()
    batch = _device_batch(BATCH, t, cfg.beit3.img_size, rng=0)
    base_infer = _retry(lambda: bench_inference(model, batch),
                        label="flagship") / n_chips

    # 1b) token-branch-only serving — the reference's inference path
    # uses ONLY the token branch (apis/inference.py:67 predictions[1]);
    # dual-branch above is the conservative scoreboard number
    try:
        extra["token_branch_images_per_sec_per_chip"] = round(
            _retry(lambda: bench_inference(model, batch,
                                           branches="token"),
                   label="tb") / n_chips, 2)
    except Exception as e:  # noqa: BLE001
        extra["token_branch_error"] = f"{type(e).__name__}: {e}"[:200]

    # 1c) token-branch serving with EViT-style vision-token pruning
    # (BEiT3Config.token_prune_keep): keep top-K patch tokens by CLS
    # attention after layer 4 — the sequence-length lever above the
    # S=421 bandwidth floor.  K chosen so the post-prune joint length
    # is lane-aligned: 235 -> S=256, 107 -> S=128 (vs 421 unpruned).
    # Same param tree, so the flagship's random params serve directly.
    try:
        import dataclasses as _dc

        from simvg_tpu.models import SimVGModel as _SM, \
            SimVGConfig as _SC

        pparams = _random_params(model, batch)
        for keep in (235, 107):
            pmodel = _SM(_SC(
                beit3=_dc.replace(cfg.beit3, token_prune_keep=keep,
                                  token_prune_layer=4),
                head=cfg.head))
            s_after = 1 + keep + t
            extra[f"token_prune_s{s_after}_images_per_sec_per_chip"] = \
                round(_retry(lambda m=pmodel: bench_inference(
                    m, batch, branches="token", params=pparams),
                    label=f"prune{keep}") / n_chips, 2)
    except Exception as e:  # noqa: BLE001
        extra["token_prune_error"] = f"{type(e).__name__}: {e}"[:200]
    # 2) full train step on the flagship (scan layout, like the configs)
    train_cfg = SimVGConfig(
        beit3=BEiT3Config.base(img_size=640, patch_size=32,
                               dtype=jnp.bfloat16, scan_layers=True,
                               remat=True,  # required to fit bwd at
                               # bs=32 in 16G HBM (like the configs)
                               attn_impl="pallas"),  # custom-VJP fused
        # attention: 224 vs 199 img/s over XLA at S=421
        head=TGQSHeadConfig(in_channels=768, dtype=jnp.bfloat16),
    )
    tb = _device_batch(BATCH, t, 640, rng=1, with_gt=True)
    try:
        extra["train_step_images_per_sec_per_chip"] = round(
            _retry(lambda: bench_train_step(SimVGModel(train_cfg), tb),
                   label="train") / n_chips, 2)
    except Exception as e:  # noqa: BLE001
        extra["train_step_error"] = f"{type(e).__name__}: {e}"[:200]

    # 3) accuracy-bearing config: ViT-L/32 @640 (model-zoo backbone)
    large_cfg = SimVGConfig(
        beit3=BEiT3Config.large(img_size=640, patch_size=32,
                                dtype=jnp.bfloat16, scan_layers=True,
                                attn_impl="pallas"),  # 365 vs 339 img/s
        head=TGQSHeadConfig(in_channels=1024, dtype=jnp.bfloat16),
    )
    lb = _device_batch(BATCH, t, 640, rng=2)
    try:
        extra["large32_images_per_sec_per_chip"] = round(
            _retry(lambda: bench_inference(SimVGModel(large_cfg), lb,
                                           iters=10),
                   label="large32") / n_chips, 2)
    except Exception as e:  # noqa: BLE001
        extra["large32_error"] = f"{type(e).__name__}: {e}"[:200]

    # 4) perf levers (VERDICT r2 #3) — measured, win or lose.  Gated
    # behind BENCH_FULL=1 to bound the driver run's remote-compile
    # count; the measured numbers live in ROADMAP.md "Levers"
    # (r3, same-run flagship 1125.3): img672 1042.3 (-7%), s512 1039.2
    # (-8%), int8 1150.0 (+2.2%, logit drift 1e-4), b=64/128 lose.
    if not os.environ.get("BENCH_FULL"):
        extra["levers_note"] = ("measured in ROADMAP.md Levers "
                                "(BENCH_FULL=1 re-runs them)")
        _emit(base_infer, extra)
        return

    # (a) img_size=672: 21x21 grid, S=463 (config variant
    #     configs/single/ViT-base/refcoco/refcoco_onestage_672.py)
    cfg672 = SimVGConfig(
        beit3=BEiT3Config.base(img_size=672, patch_size=32,
                               dtype=jnp.bfloat16, attn_impl="pallas"),
        head=TGQSHeadConfig(in_channels=768, dtype=jnp.bfloat16),
    )
    b672 = _device_batch(BATCH, t, 672, rng=3)
    try:
        extra["img672_images_per_sec_per_chip"] = round(
            _retry(lambda: bench_inference(SimVGModel(cfg672), b672),
                   label="img672") / n_chips, 2)
    except Exception as e:  # noqa: BLE001
        extra["img672_error"] = f"{type(e).__name__}: {e}"[:200]

    # (b) S=421 -> 512 lane padding: text axis padded 20 -> 111 tokens
    #     (everything past the 18 real ones attention-masked)
    b512 = _device_batch(BATCH, 111, 640, rng=4)
    mask512 = np.zeros((BATCH, 111), np.int32)
    mask512[:, 18:] = 1
    b512["text_padding_mask"] = jnp.asarray(mask512)
    try:
        extra["s512_images_per_sec_per_chip"] = round(
            _retry(lambda: bench_inference(model, b512),
                   label="s512") / n_chips, 2)
    except Exception as e:  # noqa: BLE001
        extra["s512_error"] = f"{type(e).__name__}: {e}"[:200]

    # (c) int8 serving: w8a8 dynamic quant on the encoder's parameter
    #     matmuls (ops/quant.py) — MXU 2x path; report drift vs bf16
    cfg_i8 = SimVGConfig(
        beit3=BEiT3Config.base(img_size=640, patch_size=32,
                               dtype=jnp.bfloat16, attn_impl="pallas",
                               quant="int8"),
        head=TGQSHeadConfig(in_channels=768, dtype=jnp.bfloat16),
    )
    try:
        m_i8 = SimVGModel(cfg_i8)
        extra["int8_images_per_sec_per_chip"] = round(
            _retry(lambda: bench_inference(m_i8, batch),
                   label="int8") / n_chips, 2)
        # numeric drift vs the bf16 flagship on one small batch
        p_small = _random_params(model, check_batch)

        def _logits(m, p):
            o = jax.jit(lambda p, b: m.apply(
                p, image=b["image"], text_ids=b["text_ids"],
                text_padding_mask=b["text_padding_mask"],
                img_shape=b["img_shape"], deterministic=True)
            )(p, check_batch)
            return np.asarray(o["class_token"][-1], np.float32)

        extra["int8_vs_bf16_logit_max_abs"] = round(float(
            np.abs(_logits(m_i8, p_small)
                   - _logits(model, p_small)).max()), 4)
    except Exception as e:  # noqa: BLE001
        extra["int8_error"] = f"{type(e).__name__}: {e}"[:200]

    # (d) int8_static serving: pre-quantized weights + calibrated
    #     activation scales (ops/quant.py build_quant_collection) —
    #     removes the dynamic requantization streams that ate the w8a8
    #     gain in (c); the only per-step elementwise cost left is the
    #     activation round/clip
    try:
        from simvg_tpu.ops.quant import build_quant_collection

        cfg_cal = SimVGConfig(
            beit3=BEiT3Config.base(img_size=640, patch_size=32,
                                   dtype=jnp.bfloat16,
                                   attn_impl="pallas",
                                   quant="int8_calib"),
            head=TGQSHeadConfig(in_channels=768, dtype=jnp.bfloat16),
        )
        cfg_st = SimVGConfig(
            beit3=BEiT3Config.base(img_size=640, patch_size=32,
                                   dtype=jnp.bfloat16,
                                   attn_impl="pallas",
                                   quant="int8_static"),
            head=TGQSHeadConfig(in_channels=768, dtype=jnp.bfloat16),
        )
        m_cal, m_st = SimVGModel(cfg_cal), SimVGModel(cfg_st)
        p_fp = _random_params(model, batch)

        def _skel(m):
            return jax.eval_shape(lambda: m.init(
                jax.random.PRNGKey(0),
                image=batch["image"][:1],
                text_ids=batch["text_ids"][:1],
                text_padding_mask=batch["text_padding_mask"][:1],
                img_shape=batch["img_shape"][:1]))["quant"]

        qzero = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                             _skel(m_cal))

        @jax.jit
        def _calibrate(p, qz, b):
            _, mut = m_cal.apply(
                {"params": p["params"], "quant": qz},
                image=b["image"], text_ids=b["text_ids"],
                text_padding_mask=b["text_padding_mask"],
                img_shape=b["img_shape"], deterministic=True,
                mutable=["quant"])
            return mut["quant"]

        amax = _calibrate(p_fp, qzero, batch)
        qcol = jax.jit(lambda p, a: build_quant_collection(
            p["params"], _skel(m_st), a, margin=1.05))(p_fp, amax)
        vars_st = {"params": p_fp["params"], "quant": qcol}
        extra["int8_static_images_per_sec_per_chip"] = round(
            _retry(lambda: bench_inference(m_st, batch, params=vars_st),
                   label="int8_static") / n_chips, 2)
    except Exception as e:  # noqa: BLE001
        extra["int8_static_error"] = f"{type(e).__name__}: {e}"[:200]

    # (e) AOT-exported serving parity (simvg_tpu/export.py): the
    #     deployment artifact must serve at the in-process jit rate.
    #     Weights stay an argument (bake_weights=False) so lowering
    #     does not haul ~0.5 GB of constants through the tunnelled
    #     host; the timed loop calls the Exported inside fori_loop.
    try:
        from simvg_tpu.export import export_serving

        p_aot = _random_params(model, batch)
        exp = export_serving(model, p_aot, batch, platforms=None,
                             bake_weights=False)

        @jax.jit
        def aot_n(p, image, text_ids, text_padding_mask, img_shape):
            def body(i, acc):
                out = exp.call(p, dict(
                    image=image + acc * 1e-38, text_ids=text_ids,
                    text_padding_mask=text_padding_mask,
                    img_shape=img_shape))
                return acc + (out["token"]["best_score"].sum()
                              + out["decoder"]["best_score"].sum())
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        aot_args = (p_aot, batch["image"], batch["text_ids"],
                    batch["text_padding_mask"], batch["img_shape"])
        dt = _retry(lambda: _timed_loop(lambda: aot_n(*aot_args)),
                    label="aot")
        extra["aot_exported_images_per_sec_per_chip"] = round(
            BATCH * ITERS / dt / n_chips, 2)
    except Exception as e:  # noqa: BLE001
        extra["aot_error"] = f"{type(e).__name__}: {e}"[:200]

    _emit(base_infer, extra)


def _emit(base_infer, extra):
    print(json.dumps({
        "metric": "rec_inference_images_per_sec_per_chip",
        "value": round(float(base_infer), 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(
            float(base_infer) / REFERENCE_IMAGES_PER_SEC_ESTIMATE, 3),
        "baseline_note": "reference publishes no in-repo throughput; "
                         "120 img/s RTX3090 is a documented estimate",
        "extra": extra,
    }))


def _emit_error(e: BaseException, retries: int) -> None:
    """Self-describing record when the TPU backend stayed unavailable
    through every fresh-process retry: value 0.0 = "did not measure"
    (see extra.error), never silence — the driver archives whatever
    this prints."""
    print(json.dumps({
        "metric": "rec_inference_images_per_sec_per_chip",
        "value": 0.0,
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
        "baseline_note": "reference publishes no in-repo throughput; "
                         "120 img/s RTX3090 is a documented estimate",
        "extra": {
            "error": (f"TPU backend unavailable after {retries} "
                      f"fresh-process retries: "
                      f"{type(e).__name__}: {e}")[:400],
            "last_known_good": "BENCH_r02.json: 1137.7 img/s/chip",
        },
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # A crashed TPU worker poisons the in-process backend — only a
        # FRESH process recovers (worker restarts in ~1-2 min; a
        # degraded tunnel can take longer).  Re-exec with cooldowns so
        # a transient outage mid-bench still produces the JSON line.
        import os
        import traceback

        traceback.print_exc(file=sys.stderr)
        n = int(os.environ.get("BENCH_REEXEC", "0"))
        if n >= 4:
            # ~15 min of fresh-process retries exhausted
            _emit_error(e, n)
            sys.exit(1)
        print(f"# bench: fatal backend error — re-exec {n + 1}/4 in a "
              "fresh process after 180s cooldown", file=sys.stderr,
              flush=True)
        time.sleep(180)
        os.environ["BENCH_REEXEC"] = str(n + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
