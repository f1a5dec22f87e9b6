#!/usr/bin/env python
"""Export a trained model as an AOT serving artifact (jax.export).

One file, weights baked in: the serving site deserializes and calls —
no model code, config tree, checkpoint, or flax needed there
(simvg_tpu/export.py; no reference analogue — the reference serves from
the live torch process, simvg/apis/inference.py:20-140).  Lowering is
cross-platform: export for TPU from this (possibly CPU-only) host.

    python tools/misc/export_serving.py <config> <ckpt> \
        --target-platforms tpu --polymorphic-batch --out model.jaxexp

    # serving site:
    from simvg_tpu.export import load_exported
    preds = load_exported("model.jaxexp").call(batch)

For int8_static serving, pass the calibrated artifact from
tools/misc/quantize_serving.py via --quant-collection (the baked
constants are then the pre-quantized int8 weights + scales).
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
    p = argparse.ArgumentParser(description="AOT serving export")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="trained checkpoint (omit for random init, "
                        "e.g. smoke runs)")
    p.add_argument("--out", default="model.jaxexp")
    p.add_argument("--target-platforms", nargs="+", default=["tpu"],
                   help="lowering targets (tpu/cpu/cuda); the artifact "
                        "runs on any of them")
    p.add_argument("--polymorphic-batch", action="store_true",
                   help="symbolic batch dim: one artifact serves any "
                        "batch size")
    p.add_argument("--batch-size", type=int, default=None,
                   help="static batch size (default: the loader's)")
    p.add_argument("--quant-collection", default=None,
                   help=".npz from tools/misc/quantize_serving.py "
                        "(use with model.vis_enc.quant=int8_static)")
    p.add_argument("--platform", default=None,
                   help="jax platform for THIS process (lowering host)")
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
    from simvg_tpu.export import (
        SERVING_INPUTS,
        export_serving,
        save_exported,
    )
    from simvg_tpu.models.builder import build_model
    from simvg_tpu.ops.quant import attach_static_quant
    from simvg_tpu.utils.checkpoint import load_checkpoint

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(parse_cfg_options(args.cfg_options))
    img_size = cfg.get("img_size", 640)
    dtype = jnp.bfloat16 if cfg.get("use_bf16", True) else jnp.float32
    model, _ = build_model(cfg.model, img_size=img_size, dtype=dtype)

    norm_on_device = cfg.get("normalize_on_device", False)
    ds = build_dataset_from_cfg(cfg.data["val"],
                                dataset_type=cfg.get("dataset"),
                                normalize_on_device=norm_on_device)
    loader = build_loader_from_cfg(ds, cfg, train=False,
                                   canvas=img_size)
    sample = next(iter(loader))
    batch = {k: jnp.asarray(sample[k]) for k in SERVING_INPUTS}
    if args.batch_size:
        n = args.batch_size
        # tile whole batches then slice, so the leading dim is exactly
        # n (jnp.repeat would give b0*n: it repeats each ROW n times)
        batch = {k: (jnp.concatenate(
                        [v] * (-(-n // v.shape[0])), axis=0)[:n]
                     if v.shape[0] != n else v)
                 for k, v in batch.items()}

    variables = dict(model.init(jax.random.PRNGKey(0), **batch))
    quant_skel = variables.pop("quant", None)
    if args.checkpoint:
        variables = load_checkpoint(
            args.checkpoint, params_template=variables)["params"]
    variables = attach_static_quant(variables, quant_skel,
                                    args.quant_collection)

    device_norm = (dict(cfg.get("img_norm_cfg", {})) or None) \
        if norm_on_device else None
    exp = export_serving(model, variables, batch,
                         platforms=tuple(args.target_platforms),
                         polymorphic_batch=args.polymorphic_batch,
                         device_norm=device_norm)
    save_exported(args.out, exp)

    meta = {
        "out": args.out,
        "bytes": os.path.getsize(args.out),
        "platforms": list(exp.platforms),
        "polymorphic_batch": args.polymorphic_batch,
        "inputs": {k: [list(batch[k].shape), str(batch[k].dtype)]
                   for k in SERVING_INPUTS},
        "img_size": img_size,
        "quantized": quant_skel is not None,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
