#!/usr/bin/env python
"""Calibrate an int8_static serving artifact for a trained model.

The reference has no quantized serving path (apex fp16 at most,
/root/reference/tools/train.py:96-100); this tool is the TPU-native
serving extension (ops/quant.py): run N calibration batches through the
model in ``int8_calib`` mode (records per-layer max |activation| into
the mutable "quant" collection), build the static collection
(pre-quantized per-output-channel weights + calibrated activation
scales), and save it as .npz.

Serve with::

    tools/inference.py <config> <ckpt> \
        --cfg-options model.vis_enc.quant=int8_static \
        --quant-collection <out.npz>
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser(description="int8_static calibration")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="trained checkpoint (omit for random init, "
                        "e.g. smoke runs)")
    p.add_argument("--which-set", default="val")
    p.add_argument("--num-batches", type=int, default=8)
    p.add_argument("--margin", type=float, default=1.05,
                   help="headroom multiplier on calibrated act maxima")
    p.add_argument("--out", default="quant_collection.npz")
    p.add_argument("--platform", default=None)
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="dotted overrides key=value")
    args = p.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from simvg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # repeated invocations skip recompiles
    import jax.numpy as jnp

    from simvg_tpu.config import Config, parse_cfg_options
    from simvg_tpu.data.builder import (
        build_dataset_from_cfg,
        build_loader_from_cfg,
    )
    from simvg_tpu.models.builder import build_model
    from simvg_tpu.ops.quant import (
        build_quant_collection,
        save_quant_collection,
    )
    from simvg_tpu.utils.checkpoint import load_checkpoint

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(parse_cfg_options(args.cfg_options))
    img_size = cfg.get("img_size", 640)
    dtype = jnp.bfloat16 if cfg.get("use_bf16", True) else jnp.float32

    import copy

    def model_with_quant(mode):
        mc = copy.deepcopy(dict(cfg.model))
        mc.setdefault("vis_enc", {})["quant"] = mode
        m, _ = build_model(mc, img_size=img_size, dtype=dtype)
        return m

    m_fp = model_with_quant("none")
    m_cal = model_with_quant("int8_calib")
    m_st = model_with_quant("int8_static")

    # normalize_on_device is deliberately NOT forwarded here: the
    # calibration feeds host-normalized images straight to model.apply
    # (no device-norm wrapper), which produces the same activations the
    # serving path sees after ITS device-side normalization — do not
    # "fix" this into passing the flag without also wrapping calib_step
    # in normalize_images_on_device.
    ds = build_dataset_from_cfg(cfg.data[args.which_set],
                                dataset_type=cfg.get("dataset"))
    loader = build_loader_from_cfg(ds, cfg, train=False,
                                   canvas=img_size)

    sample = next(iter(loader))
    keys = ("image", "text_ids", "text_padding_mask", "img_shape")
    init_kw = {k: sample[k] for k in keys}
    variables = m_fp.init(jax.random.PRNGKey(0), **init_kw)
    if args.checkpoint:
        variables = load_checkpoint(args.checkpoint,
                                    params_template=variables)["params"]

    skel_cal = jax.eval_shape(
        lambda: m_cal.init(jax.random.PRNGKey(0), **init_kw))["quant"]
    amax = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), skel_cal)

    @jax.jit
    def calib_step(q, batch):
        _, mut = m_cal.apply(
            {"params": variables["params"], "quant": q},
            **batch, deterministic=True, mutable=["quant"])
        return mut["quant"]

    seen = 0
    for batch in loader:
        if seen >= args.num_batches:
            break
        amax = calib_step(amax, {k: batch[k] for k in keys})
        seen += 1
    if seen == 0:
        raise SystemExit("no calibration batches produced")

    skel_st = jax.eval_shape(
        lambda: m_st.init(jax.random.PRNGKey(0), **init_kw))["quant"]
    qcol = jax.jit(lambda p, a: build_quant_collection(
        p, skel_st, a, margin=args.margin))(variables["params"], amax)
    save_quant_collection(args.out, jax.device_get(qcol))

    amax_leaves = [float(v.max()) for v in jax.tree.leaves(amax)]
    print(json.dumps({
        "out": args.out,
        "calibration_batches": seen,
        "quantized_layers": len(amax_leaves),
        "act_amax_max": max(amax_leaves),
        "act_amax_min": min(amax_leaves),
        "margin": args.margin,
    }))


if __name__ == "__main__":
    main()
