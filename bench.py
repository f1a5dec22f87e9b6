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
import os
import sys
import time

import numpy as np

REFERENCE_IMAGES_PER_SEC_ESTIMATE = 120.0  # estimate — see module docstring
BATCH = 32
ITERS = 20
WARMUP = 2

# ---- deadline bookkeeping (VERDICT r3 #1: the r03 capture died rc=124
# because retry cooldowns out-slept the driver's timeout).  The clock
# starts at the FIRST exec and survives re-execs via BENCH_START_TS.
# BENCH_DEADLINE_S bounds fresh-process retries after fatal backend
# errors; BENCH_TOTAL_S bounds the whole run — once past it, remaining
# extras are skipped (with a note) and the final line is emitted.
_START_TS = float(os.environ.setdefault("BENCH_START_TS",
                                        repr(time.time())))
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "420"))
TOTAL_S = float(os.environ.get("BENCH_TOTAL_S", "1500"))


def _elapsed() -> float:
    return time.time() - _START_TS


def _extra_budget_ok(extra: dict, label: str) -> bool:
    """False (and records a skip note) when the total budget is spent —
    the driver must always receive the final JSON line before its
    timeout, so extras yield rather than run it over."""
    if _elapsed() < TOTAL_S:
        return True
    extra.setdefault("skipped_over_budget", []).append(label)
    print(f"# bench: skipping {label} — {_elapsed():.0f}s elapsed "
          f"> BENCH_TOTAL_S={TOTAL_S:.0f}", file=sys.stderr, flush=True)
    return False


def _start_watchdog() -> None:
    """Backstop for a HANG (not an exception): if the backend wedges
    inside a C call, no except-clause ever runs and the driver's kill
    would leave no parseable record.  A daemon thread emits an interim
    error line once the total budget is exhausted; a later successful
    emit supersedes it as the last line of stdout."""
    import threading

    def run():
        wait = TOTAL_S + 120 - _elapsed()
        if wait > 0:
            time.sleep(wait)
        if not _EMITTED:
            _emit_error(
                RuntimeError("watchdog: bench still running with no "
                             f"output after {_elapsed():.0f}s"),
                int(os.environ.get("BENCH_REEXEC", "0")))

    threading.Thread(target=run, daemon=True).start()


_EMITTED = False


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


def _timed_loop(step_to_scalar, warmup=WARMUP, reps=3):
    """Median wall-time of ``reps`` post-warmup calls.  The iteration
    count lives INSIDE the fused executable (fori_loop), so a single
    dispatch times all iterations at once — host round trips over the
    tunnelled runtime are ~10s of ms and must not be in the measured
    window.  Median-of-3, not single-shot: the tunnel drifts on the
    scale of one measurement (the r4 'AOT -13.8%' artifact — the same
    compiled bytes re-timed interleaved landed within 0.5%)."""
    for _ in range(warmup):
        float(step_to_scalar())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(step_to_scalar())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


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


def bench_train_step(model, batch, iters=8, mu_dtype=None):
    """Full training step: loss (both branches + balanced distill),
    backward, global-norm clip, AdamW update, EMA — the hot loop of
    tools/train.py.  mu_dtype: optional optimizer-state dtype lever
    (optimizer_config.mu_dtype)."""
    import jax
    import jax.numpy as jnp

    from simvg_tpu.engine import (
        create_optimizer,
        create_train_state,
        make_train_step,
    )

    params = _random_params(model, batch)
    tx = create_optimizer(1e-4, steps_per_epoch=100, mu_dtype=mu_dtype)
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


def bench_int8_static(model_fp, cfg, batch, iters=ITERS):
    """int8_static serving rate for any bf16 SimVGConfig: calibrate
    activation maxima with the ``int8_calib`` variant on one batch,
    pre-quantize weights + scales (ops/quant.py build_quant_collection),
    then time the ``int8_static`` variant."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from simvg_tpu.models import SimVGModel
    from simvg_tpu.ops.quant import build_quant_collection

    def variant(quant):
        return SimVGModel(dataclasses.replace(
            cfg, beit3=dataclasses.replace(cfg.beit3, quant=quant)))

    m_cal, m_st = variant("int8_calib"), variant("int8_static")
    p_fp = _random_params(model_fp, batch)

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
    return bench_inference(m_st, batch, params=vars_st, iters=iters)


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
    programs; one retry usually succeeds (the service recovers).
    Deadline-aware: never sleeps the run past the driver's timeout."""
    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            last = e
            # stderr: stdout must stay the parseable JSON line(s)
            print(f"# bench retry {label} {i + 1}/{attempts}: "
                  f"{type(e).__name__}", file=sys.stderr, flush=True)
            if _elapsed() > TOTAL_S:
                break
            time.sleep(5)
    raise last


def _probe_backend_or_die(
        timeout: float = float(os.environ.get("BENCH_PROBE_S", "120")),
) -> None:
    """First backend contact happens in a BOUNDED subprocess.  A wedged
    TPU runtime hangs ``jax.devices()`` inside a C call — in-process
    that hang is unkillable from Python and leaves the driver's rc=124
    with no JSON (the r03 failure).  A subprocess timeout converts it
    into a fast exception that the __main__ retry/emit path handles."""
    import subprocess

    code = ("import jax, sys\n"
            "sys.stdout.write(str(len(jax.devices())))\n")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired:
        raise RuntimeError(
            f"backend probe hung >{timeout:.0f}s — TPU runtime wedged")
    if proc.returncode != 0:
        raise RuntimeError("backend probe failed: "
                           + proc.stderr.strip()[-400:])


def main():
    _start_watchdog()
    _probe_backend_or_die()

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the remote compiler costs minutes
    # per midsize program through the tunnel; warmed by dev runs so the
    # driver's end-of-round run reuses the executables.
    from simvg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _batch, _flagship
    from simvg_tpu.models import SimVGModel, SimVGConfig
    from simvg_tpu.models.beit3 import BEiT3Config
    from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig

    n_chips = max(jax.device_count(), 1)

    extra = {}

    # 1) flagship base/32 inference — the primary scoreboard metric,
    # measured FIRST and emitted as a preliminary line so a driver kill
    # mid-extras still leaves the scoreboard number parseable (the
    # final emit at the end of main supersedes it as the last line)
    model, _, t, cfg = _flagship()
    batch = _device_batch(BATCH, t, cfg.beit3.img_size, rng=0)
    base_infer = _retry(lambda: bench_inference(model, batch),
                        label="flagship") / n_chips
    _emit(base_infer, {"status": "preliminary — extras in progress"})

    # 0) on-device Pallas<->XLA numerical cross-check (fwd + grad);
    # raises on divergence — the shipped default's numerics are proven
    # where they actually execute, not just in interpret mode
    check_batch = _device_batch(4, 20, 640, rng=7)
    grad_batch = _device_batch(4, 20, 640, rng=8)
    try:
        extra.update(_retry(
            lambda: crosscheck_pallas_vs_xla(check_batch, grad_batch),
            label="crosscheck"))
    except AssertionError:
        raise  # numerical divergence must fail the bench loudly
    except Exception as e:  # noqa: BLE001
        extra["crosscheck_error"] = f"{type(e).__name__}: {e}"[:200]

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

    if not _extra_budget_ok(extra, "train_step"):
        _emit(base_infer, extra)
        return
    # 2) full train step on the flagship, unrolled + NO remat (the
    # shipped ViT-base recipe since r4: the bf16 bwd at bs=32 fits in
    # 16G because the fused-attention VJP never materializes S^2 —
    # measured 283 img/s vs 226 with scan+remat, ROADMAP "Training
    # floor").  Fallback: scan+remat, which always fits.
    train_cfg = SimVGConfig(
        beit3=BEiT3Config.base(img_size=640, patch_size=32,
                               dtype=jnp.bfloat16, scan_layers=False,
                               remat=False,
                               attn_impl="pallas"),  # custom-VJP fused
        # attention: 224 vs 199 img/s over XLA at S=421
        head=TGQSHeadConfig(in_channels=768, dtype=jnp.bfloat16),
    )
    train_cfg_fallback = SimVGConfig(
        beit3=BEiT3Config.base(img_size=640, patch_size=32,
                               dtype=jnp.bfloat16, scan_layers=True,
                               remat=True, attn_impl="pallas"),
        head=TGQSHeadConfig(in_channels=768, dtype=jnp.bfloat16),
    )
    tb = _device_batch(BATCH, t, 640, rng=1, with_gt=True)
    try:
        extra["train_step_images_per_sec_per_chip"] = round(
            _retry(lambda: bench_train_step(SimVGModel(train_cfg), tb),
                   label="train") / n_chips, 2)
        # optimizer-state dtype lever (VERDICT r4 #7): bf16 first
        # moment cuts the f32 optimizer HBM stream the r4 ablation
        # identified (~18 ms at the HBM floor).  Measured side by side
        # with the f32-state recipe above.
        extra["train_step_mu_bf16_images_per_sec_per_chip"] = round(
            _retry(lambda: bench_train_step(SimVGModel(train_cfg), tb,
                                            mu_dtype="bfloat16"),
                   label="train_mu_bf16") / n_chips, 2)
    except Exception as e:  # noqa: BLE001
        extra["train_step_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            extra["train_step_scan_remat_images_per_sec_per_chip"] = \
                round(_retry(lambda: bench_train_step(
                    SimVGModel(train_cfg_fallback), tb),
                    label="train_fb") / n_chips, 2)
        except Exception as e2:  # noqa: BLE001
            extra["train_step_fallback_error"] = \
                f"{type(e2).__name__}: {e2}"[:200]

    if not _extra_budget_ok(extra, "token_prune"):
        _emit(base_infer, extra)
        return
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
        # 300 = 75% of the 400 patch tokens: the default-safe serving
        # point (inside the measured accuracy envelope, no force
        # needed); 235/107 are below-envelope lever measurements.
        for keep in (300, 235, 107):
            pmodel = _SM(_SC(
                beit3=_dc.replace(cfg.beit3, token_prune_keep=keep,
                                  token_prune_layer=4,
                                  # perf-lever measurement: K below the
                                  # accuracy envelope on purpose
                                  token_prune_force=keep < 300),
                head=cfg.head))
            s_after = 1 + keep + t
            extra[f"token_prune_s{s_after}_images_per_sec_per_chip"] = \
                round(_retry(lambda m=pmodel: bench_inference(
                    m, batch, branches="token", params=pparams),
                    label=f"prune{keep}") / n_chips, 2)
    except Exception as e:  # noqa: BLE001
        extra["token_prune_error"] = f"{type(e).__name__}: {e}"[:200]
    if not _extra_budget_ok(extra, "large32"):
        _emit(base_infer, extra)
        return
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

    # 4) perf levers (VERDICT r2 #3) — measured, win or lose.  Always
    # on for the driver run (VERDICT r3 #1 wants int8_static/AOT
    # driver-captured); BENCH_FULL=0 disables for quick dev runs.
    # Ordered by scoreboard value so a spent budget drops the cosmetic
    # sweeps, never the serving levers.
    if os.environ.get("BENCH_FULL") == "0":
        extra["levers_note"] = ("disabled by BENCH_FULL=0; measured "
                                "numbers in ROADMAP.md Levers")
        _emit(base_infer, extra)
        return
    if not _extra_budget_ok(extra, "levers"):
        _emit(base_infer, extra)
        return

    # (d) int8_static serving: pre-quantized weights + calibrated
    #     activation scales — removes the dynamic requantization
    #     streams that eat the w8a8 gain in (c); the only per-step
    #     elementwise cost left is the activation round/clip
    try:
        extra["int8_static_images_per_sec_per_chip"] = round(
            _retry(lambda: bench_int8_static(model, cfg, batch),
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

    # (f) int8_static on the accuracy-bearing ViT-L/32 (VERDICT r3 #6:
    #     the model zoo's published numbers are large-model; the lever
    #     suite must be measured where accuracy lives)
    if not _extra_budget_ok(extra, "large32_int8_static"):
        _emit(base_infer, extra)
        return
    try:
        extra["large32_int8_static_images_per_sec_per_chip"] = round(
            _retry(lambda: bench_int8_static(
                SimVGModel(large_cfg), large_cfg, lb, iters=10),
                label="large32_int8_static") / n_chips, 2)
    except Exception as e:  # noqa: BLE001
        extra["large32_int8_static_error"] = \
            f"{type(e).__name__}: {e}"[:200]

    if not _extra_budget_ok(extra, "sweeps"):
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

    if not _extra_budget_ok(extra, "s512"):
        _emit(base_infer, extra)
        return
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

    if not _extra_budget_ok(extra, "int8_dynamic"):
        _emit(base_infer, extra)
        return
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

    _emit(base_infer, extra)


def _emit(base_infer, extra):
    global _EMITTED
    print(json.dumps({
        "metric": "rec_inference_images_per_sec_per_chip",
        "value": round(float(base_infer), 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(
            float(base_infer) / REFERENCE_IMAGES_PER_SEC_ESTIMATE, 3),
        "baseline_note": "reference publishes no in-repo throughput; "
                         "120 img/s RTX3090 is a documented estimate",
        "extra": extra,
    }), flush=True)
    _EMITTED = True


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
    }), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # A crashed TPU worker poisons the in-process backend — only a
        # FRESH process recovers (worker restarts in ~1-2 min).
        # Deadline-aware (VERDICT r3 #1: 180s cooldowns × 4 out-slept
        # the driver's timeout in r03): the error JSON is written
        # BEFORE any cooldown/re-exec so a driver kill at any moment
        # still leaves a parseable record, cooldowns are short, and
        # the retry budget is a wall-clock deadline across re-execs
        # (BENCH_DEADLINE_S from the FIRST exec), not a fixed count.
        import traceback

        traceback.print_exc(file=sys.stderr)
        n = int(os.environ.get("BENCH_REEXEC", "0"))
        if not _EMITTED:
            _emit_error(e, n)  # parseable record, survives any kill;
            # a later successful emit supersedes it as the last line
        cooldown = 30.0
        if _elapsed() + cooldown >= DEADLINE_S:
            print(f"# bench: retry deadline spent ({_elapsed():.0f}s "
                  f">= BENCH_DEADLINE_S={DEADLINE_S:.0f})",
                  file=sys.stderr, flush=True)
            sys.exit(1)
        print(f"# bench: fatal backend error — re-exec {n + 1} in a "
              f"fresh process after {cooldown:.0f}s cooldown",
              file=sys.stderr, flush=True)
        time.sleep(cooldown)
        os.environ["BENCH_REEXEC"] = str(n + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
