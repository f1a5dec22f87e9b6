#!/usr/bin/env python
"""Batch inference + visualisation dumps (reference tools/inference.py +
simvg/apis/inference.py:20-140): run a split through the model and write
images with predicted (red) / GT (blue) boxes; GRefCOCO filters by
score threshold.  --with-attn additionally overlays each image's
decoder cross-attention map (the reference's `visualizer` attention
dump, apis/inference.py:107-137)."""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="simvg_tpu inference")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--which-set", default="val")
    p.add_argument("--output-dir", default="inference_out")
    p.add_argument("--branch", default="token",
                   choices=["token", "decoder"])
    p.add_argument("--score-threshold", type=float, default=0.7)
    p.add_argument("--max-images", type=int, default=100)
    p.add_argument("--with-attn", action="store_true",
                   help="also write decoder cross-attention heatmaps")
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

    enable_compilation_cache()  # restarts/auto-resume skip recompiles
    import numpy as np

    from simvg_tpu.config import Config
    from simvg_tpu.data.builder import (
        build_dataset_from_cfg,
        build_loader_from_cfg,
    )
    from simvg_tpu.engine.train import make_eval_step
    from simvg_tpu.models.builder import build_model
    from simvg_tpu.utils.checkpoint import load_checkpoint
    from simvg_tpu.utils.visualize import imshow_expr_bbox

    from simvg_tpu.config import parse_cfg_options

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(parse_cfg_options(args.cfg_options))
    img_size = cfg.get("img_size", 640)
    is_grec = cfg.get("dataset") == "GRefCOCO"
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.get("use_bf16", True) else jnp.float32
    model, _ = build_model(cfg.model, img_size=img_size, dtype=dtype)

    ds = build_dataset_from_cfg(cfg.data[args.which_set],
                                dataset_type=cfg.get("dataset"))
    loader = build_loader_from_cfg(
        ds, cfg, train=False, canvas=img_size,
        max_gt=min(cfg.get("max_gt", 12 if is_grec else 1),
                   cfg.model.get("head", {}).get("num_queries", 1)),
    )

    sample = next(iter(loader))
    params = dict(model.init(
        jax.random.PRNGKey(0),
        **{k: sample[k] for k in
           ("image", "text_ids", "text_padding_mask", "img_shape")},
    ))
    # int8_static models carry a "quant" collection the checkpoint does
    # not have: split it off the restore template, re-attach after.
    quant_skel = params.pop("quant", None)
    from simvg_tpu.ops.quant import attach_static_quant

    params = attach_static_quant(
        load_checkpoint(args.checkpoint, params_template=params)["params"],
        quant_skel, args.quant_collection)
    if not args.with_attn:
        step = jax.jit(make_eval_step(model))
        grid = None
    else:
        ps = cfg.model.get("vis_enc", {}).get("patch_size", 32)
        grid = img_size // ps
        from simvg_tpu.models.model import decode_predictions

        @jax.jit
        def step(params, device_batch):
            # ONE forward for both predictions and attention maps
            out, inter = model.apply(
                params,
                image=device_batch["image"],
                text_ids=device_batch["text_ids"],
                text_padding_mask=device_batch["text_padding_mask"],
                img_shape=device_batch["img_shape"],
                deterministic=True,
                mutable=["intermediates"],
            )
            preds = {
                name: decode_predictions(out[ck][-1], out[bk][-1],
                                         device_batch["img_shape"])
                for name, ck, bk in (
                    ("decoder", "class_decoder", "bbox_decoder"),
                    ("token", "class_token", "bbox_token"),
                )
            }
            dec = inter["intermediates"]["head"]["decoder"]
            # last decoder layer's cross-attention, head-averaged
            # (numeric sort: "layers_10" > "layers_9")
            last = sorted(
                (k for k in dec if "cross_attn" in dec[k]),
                key=lambda k: int(k.rsplit("_", 1)[-1]),
            )[-1]
            (w,) = dec[last]["cross_attn"]["attn_weights"]  # [B,H,Q,HW]
            preds["attn"] = w.mean(axis=1)  # [B, Q, HW]
            return preds

    os.makedirs(args.output_dir, exist_ok=True)
    written = 0
    for batch in loader:
        preds = step(params,
                     {k: v for k, v in batch.items() if k != "meta"})
        p_b = preds[args.branch]
        attn = (np.asarray(preds["attn"])
                if args.with_attn else None)
        for i, meta in enumerate(batch["meta"]):
            if not batch["batch_valid"][i] or written >= args.max_images:
                continue
            img = cv2.imread(meta["filename"], cv2.IMREAD_COLOR)
            sf = batch["scale_factor"][i]
            if is_grec:
                boxes = np.asarray(p_b["boxes"][i])
                scores = np.asarray(p_b["scores"][i])
                keep = scores >= args.score_threshold
                box = boxes[keep] / sf
            else:
                box = np.asarray(p_b["best_box"][i]) / sf
            nt = int(batch["gt_valid"][i].sum())
            gt = batch["gt_boxes"][i, :nt] / sf
            out_file = osp.join(
                args.output_dir,
                f"{written:05d}_"
                + osp.splitext(osp.basename(meta["filename"]))[0]
                + ".jpg",
            )
            imshow_expr_bbox(img, box, out_file, gt_bbox=gt,
                             expression=meta["expression"])
            if attn is not None:
                amap = attn[i, 0].reshape(grid, grid)
                amap = amap / max(float(amap.max()), 1e-8)
                amap = cv2.resize((amap * 255).astype(np.uint8),
                                  (img.shape[1], img.shape[0]))
                heat = cv2.applyColorMap(amap, cv2.COLORMAP_JET)
                overlay = cv2.addWeighted(img, 0.55, heat, 0.45, 0)
                cv2.imwrite(out_file.replace(".jpg", "_attn.jpg"),
                            overlay)
            written += 1
        if written >= args.max_images:
            break
    print(f"wrote {written} visualisations to {args.output_dir}")


if __name__ == "__main__":
    main()
