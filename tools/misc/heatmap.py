#!/usr/bin/env python
"""Single-image Grad-CAM heatmap with the prediction drawn on top
(reference tools/misc/heatmap.py:1-237): take ONE raw image + a
free-text expression, run it through the val pipeline's raw-source
path (reference prepare_img fabricates an annotation record), compute
the Grad-CAM of the best query's object score over the image feature
grid, and write the original image blended with the JET heatmap plus
the predicted box and its "object: NN.NN%" label (reference
plot_cam_image, heatmap.py:87-114).

Differs from vis_cam.py (which sweeps a dataset split and writes bare
CAMs): raw input source, prediction overlay, per-image output naming.
The CAM math itself is shared (vis_cam.compute_cam)."""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def parse_args():
    p = argparse.ArgumentParser(description="Grad-CAM heatmap over one "
                                "raw image + expression")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--image-path", required=True)
    p.add_argument("--text", required=True,
                   help="referring expression")
    p.add_argument("--branch", default="decoder",
                   choices=["token", "decoder"])
    p.add_argument("--save-dir", default="visualize/GradCAM")
    p.add_argument("--quant-collection", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="dotted overrides key=value")
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import cv2
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from vis_cam import compute_cam

    from simvg_tpu.config import Config, parse_cfg_options
    from simvg_tpu.data.loader import collate
    from simvg_tpu.data.raw import RawPreprocessor
    from simvg_tpu.engine.train import make_eval_step
    from simvg_tpu.models.builder import build_model
    from simvg_tpu.utils.checkpoint import load_checkpoint

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(parse_cfg_options(args.cfg_options))
    img_size = cfg.get("img_size", 640)
    model, _ = build_model(cfg.model, img_size=img_size)

    img = cv2.imread(args.image_path, cv2.IMREAD_COLOR)
    assert img is not None, args.image_path
    preproc = RawPreprocessor(cfg)
    s = preproc(img, args.text, filename=args.image_path)
    batch = collate([s], canvas=img_size, max_gt=1)
    inputs = {k: jnp.asarray(batch[k]) for k in
              ("image", "text_ids", "text_padding_mask", "img_shape")}

    params = dict(model.init(jax.random.PRNGKey(0), **inputs))
    quant_skel = params.pop("quant", None)
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint,
                                 params_template=params)["params"]
    if quant_skel is not None:
        from simvg_tpu.ops.quant import attach_static_quant

        params = attach_static_quant(params, quant_skel,
                                     args.quant_collection)

    # prediction (best box + score) on the same input the CAM sees
    step = jax.jit(make_eval_step(model,
                                  device_norm=preproc.device_norm))
    preds = step(params, {k: v for k, v in batch.items()
                          if k != "meta"})
    box = np.asarray(preds[args.branch]["best_box"][0]) \
        / batch["scale_factor"][0]  # back to original-image scale
    score = float(preds[args.branch]["best_score"][0])

    cam = compute_cam(model, params, inputs, args.branch, img_size,
                      family=cfg.model.get("type"))[0]

    # reference gen_cam/plot_cam_image: JET heatmap resized to the
    # ORIGINAL image, blended 0.4 img + 0.6 heat, box + label on top
    h, w = img.shape[:2]
    m = cam / max(cam.max(), 1e-8)
    heat = cv2.applyColorMap((m * 255).astype(np.uint8),
                             cv2.COLORMAP_JET)
    heat = cv2.resize(heat, (w, h))
    vis = (img.astype(np.float32) * 0.4
           + heat.astype(np.float32) * 0.6).astype(np.uint8)
    x1, y1, x2, y2 = [int(round(v)) for v in box.tolist()]
    color = (0, 0, 255)
    vis = cv2.rectangle(vis, (x1, y1), (x2, y2), color,
                        max(1, w // 112))
    cv2.putText(vis, "object: %.2f%%" % (score * 100),
                (x1, max(12, y1 - max(1, h // 100))),
                cv2.FONT_HERSHEY_SIMPLEX,
                0.001 * min(h, w) + 0.72, color, 2)

    os.makedirs(args.save_dir, exist_ok=True)
    stem = osp.splitext(osp.basename(args.image_path))[0]
    out = osp.join(args.save_dir,
                   f"{stem}-{args.branch}-heatmap.jpg")
    cv2.imwrite(out, vis)
    print(f"expression: {args.text!r}")
    print(f"box (xyxy, original scale): {box.tolist()} "
          f"score: {score:.3f}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
