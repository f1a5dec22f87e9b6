#!/usr/bin/env python
"""Decoder cross-attention visualisation (reference
tools/misc/attn_visual.py, which used `visualizer.get_local` hooks):
overlays each decoder layer's cross-attention map (query -> image grid)
as a heatmap on the input image."""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--which-set", default="val")
    p.add_argument("--output-dir", default="attn_out")
    p.add_argument("--num", type=int, default=8)
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
    import jax.numpy as jnp

    from simvg_tpu.config import Config, parse_cfg_options
    from simvg_tpu.data.builder import (
        build_dataset_from_cfg,
        build_loader_from_cfg,
    )
    from simvg_tpu.models.builder import build_model
    from simvg_tpu.utils.checkpoint import load_checkpoint

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(parse_cfg_options(args.cfg_options))
    img_size = cfg.get("img_size", 640)
    model, _ = build_model(cfg.model, img_size=img_size)
    ds = build_dataset_from_cfg(cfg.data[args.which_set],
                                dataset_type=cfg.get("dataset"))
    loader = build_loader_from_cfg(ds, cfg, train=False, canvas=img_size)
    batch = next(iter(loader))
    inputs = {k: jnp.asarray(batch[k]) for k in
              ("image", "text_ids", "text_padding_mask", "img_shape")}

    params = dict(model.init(jax.random.PRNGKey(0), **inputs))
    # int8_static models carry a "quant" collection checkpoints never
    # have (ops/quant.attach_static_quant rebuilds it after restore)
    quant_skel = params.pop("quant", None)
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint,
                                 params_template=params)["params"]
    if quant_skel is not None:
        from simvg_tpu.ops.quant import attach_static_quant

        params = attach_static_quant(params, quant_skel)

    _, inter = model.apply(params, **inputs, mutable=["intermediates"])
    head_inter = inter["intermediates"]["head"]["decoder"]
    ps = cfg.model.vis_enc.get("patch_size", 32)
    g = img_size // ps

    os.makedirs(args.output_dir, exist_ok=True)
    written = 0
    for lname, ldict in sorted(head_inter.items()):
        if "cross_attn" not in ldict:
            continue
        (w,) = ldict["cross_attn"]["attn_weights"]  # [B, H, Q, HW]
        attn = np.asarray(w.mean(axis=1))  # head-average [B, Q, HW]
        for i in range(min(args.num, attn.shape[0])):
            amap = attn[i, 0].reshape(g, g)
            amap = amap / max(amap.max(), 1e-8)
            amap = cv2.resize((amap * 255).astype(np.uint8),
                              (img_size, img_size))
            heat = cv2.applyColorMap(amap, cv2.COLORMAP_JET)
            img = cv2.imread(batch["meta"][i]["filename"])
            img = cv2.resize(img, (img_size, img_size))
            out = cv2.addWeighted(img, 0.55, heat, 0.45, 0)
            expr = (batch["meta"][i]["expression"] or "")[:60]
            cv2.putText(out, expr, (4, 16), cv2.FONT_HERSHEY_SIMPLEX,
                        0.45, (255, 255, 255), 1)
            cv2.imwrite(osp.join(args.output_dir,
                                 f"{lname}_{i:03d}.jpg"), out)
            written += 1
    print(f"wrote {written} attention maps to {args.output_dir}")


if __name__ == "__main__":
    main()
