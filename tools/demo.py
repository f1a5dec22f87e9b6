#!/usr/bin/env python
"""Single image + free-text expression demo (reference
tools/demo.py:16-121): run the val pipeline on one raw image with a
fabricated annotation record and draw the predicted box."""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="simvg_tpu demo")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--img", required=True)
    p.add_argument("--expression", required=True)
    p.add_argument("--output-dir", default="demo_out")
    p.add_argument("--branch", default="token",
                   choices=["token", "decoder"])
    p.add_argument("--quant-collection", default=None,
                   help=".npz from tools/misc/quantize_serving.py "
                        "(use with model.vis_enc.quant=int8_static)")
    p.add_argument("--platform", default=None)
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="dotted overrides key=value")
    args = p.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import cv2
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from simvg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # repeated invocations skip recompiles
    import jax.numpy as jnp
    import numpy as np

    from simvg_tpu.config import Config
    from simvg_tpu.data.loader import collate
    from simvg_tpu.data.raw import RawPreprocessor
    from simvg_tpu.engine.train import make_eval_step
    from simvg_tpu.models.builder import build_model
    from simvg_tpu.utils.checkpoint import load_checkpoint
    from simvg_tpu.utils.visualize import imshow_expr_bbox

    from simvg_tpu.config import parse_cfg_options

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(parse_cfg_options(args.cfg_options))
    img_size = cfg.get("img_size", 640)
    dtype = jnp.bfloat16 if cfg.get("use_bf16", True) else jnp.float32
    model, _ = build_model(cfg.model, img_size=img_size, dtype=dtype)

    # val pipeline on a raw source (LoadFromRawSource equivalent,
    # reference demo.py:57-75); shared with tools/serve.py
    preproc = RawPreprocessor(cfg)

    img = cv2.imread(args.img, cv2.IMREAD_COLOR)
    assert img is not None, args.img
    s = preproc(img, args.expression, filename=args.img)
    batch = collate([s], canvas=img_size, max_gt=1)

    params = dict(model.init(
        jax.random.PRNGKey(0),
        **{k: jnp.asarray(batch[k]) for k in
           ("image", "text_ids", "text_padding_mask", "img_shape")},
    ))
    # int8_static models carry a "quant" collection checkpoints never
    # have (ops/quant.attach_static_quant rebuilds it after restore)
    quant_skel = params.pop("quant", None)
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint,
                                 params_template=params)["params"]
    if quant_skel is not None:
        from simvg_tpu.ops.quant import attach_static_quant

        params = attach_static_quant(params, quant_skel,
                                     args.quant_collection)

    step = jax.jit(make_eval_step(model, device_norm=preproc.device_norm))
    preds = step(params, {k: v for k, v in batch.items() if k != "meta"})
    best = np.asarray(preds[args.branch]["best_box"][0])
    score = float(preds[args.branch]["best_score"][0])

    # map back to the original image scale
    sf = batch["scale_factor"][0]
    box_ori = best / sf
    os.makedirs(args.output_dir, exist_ok=True)
    out_file = osp.join(
        args.output_dir, osp.splitext(osp.basename(args.img))[0]
        + "_pred.jpg"
    )
    imshow_expr_bbox(img, box_ori, out_file,
                     expression=args.expression)
    print(f"expression: {args.expression!r}")
    print(f"box (xyxy, original scale): {box_ori.tolist()} "
          f"score: {score:.3f}")
    print(f"wrote {out_file}")


if __name__ == "__main__":
    main()
