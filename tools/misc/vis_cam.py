#!/usr/bin/env python
"""Grad-CAM over the encoder's image-token grid (reference
tools/misc/vis_cam.py + utils/det_cam_visualizer.py, which used
pytorch-grad-cam): gradient of the best box score w.r.t. the patch
features, channel-averaged into a class-activation map.

Covers BOTH model families:
- MIXDETRMB (BEiT3 + TGQS head): CAM on the multiway encoder's
  vision-token grid.
- OneStageModel (SeqTR-style zoo vis_enc + lan_enc + fusion + DETR
  head): CAM on the visual backbone's output feature map — the
  reference's GradCAM_SeqTR pathway (utils/gradcam_models.py), which
  hooked a backbone layer's activations."""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def compute_cam(model, params, inputs, branch, img_size, family=None):
    """Grad-CAM grids for a batch: ReLU(sum_c dS/dA_c * A_c), where S is
    the best query's object score of `branch` and A the image feature
    grid.  Shared CAM core for vis_cam.py (dataset sweep) and heatmap.py
    (single raw image + prediction overlay).  Returns np [B, h, w]."""
    import jax
    import jax.numpy as jnp

    from simvg_tpu.models.beit3 import BEiT3Encoder
    from simvg_tpu.models.heads.tgqs_head import TGQSKDDETRHead

    ck = "class_token" if branch == "token" else "class_decoder"
    b = inputs["image"].shape[0]

    if family == "OneStageModel":
        # SeqTR-style family (reference GradCAM_SeqTR,
        # utils/gradcam_models.py): CAM on the visual backbone's
        # output feature map, holding the language/fusion/head stack
        # as the scoring function.
        vp = {"params": params["params"]["vis_enc"]}
        lp = {"params": params["params"]["lan_enc"]}
        fp = {"params": params["params"]["fusion"]}
        hp = {"params": params["params"]["head"]}
        # pin eval semantics explicitly rather than relying on each
        # module's default flag (ADVICE r4)
        feat = model.vis_enc.apply(vp, inputs["image"],
                                   deterministic=True)
        lang = model.lan_enc.apply(lp, inputs["text_ids"])
        if isinstance(lang, dict):
            text_feat, text_mask = lang["text_feat"], lang["text_mask"]
        else:  # pooled modes: [B, N, C], nothing padded
            text_feat = lang
            text_mask = jnp.zeros(lang.shape[:2], bool)

        def score_fn(feat):
            fused = model.fusion.apply(fp, feat, text_feat, text_mask)
            bb, hh, ww, _ = fused.shape
            out = model.head.apply(
                hp, fused, jnp.zeros((bb, hh, ww), bool),
                deterministic=True)
            probs = jax.nn.softmax(out[ck][-1], axis=-1)[..., 0]
            return probs.max(axis=-1).sum(), out

        (_, out), grads = jax.value_and_grad(
            score_fn, has_aux=True)(feat)
        # Grad-CAM: ReLU(sum_c dS/dA_c * A_c) on the backbone grid
        return np.asarray(jax.nn.relu((grads * feat).sum(-1)))

    enc = BEiT3Encoder(model.cfg.beit3)
    head = TGQSKDDETRHead(model.cfg.head)
    enc_params = {"params": params["params"]["beit3"]}
    head_params = {"params": params["params"]["head"]}

    ps = model.cfg.beit3.patch_size
    g = img_size // ps

    img_feat, text_feat, cls_feat = enc.apply(
        enc_params, inputs["image"], inputs["text_ids"],
        inputs["text_padding_mask"])
    x_mm = img_feat.reshape(b, g, g, -1)
    pad_mask = jnp.zeros((b, g, g), bool)

    def score_fn(x_mm):
        out = head.apply(head_params, x_mm, pad_mask, cls_feat,
                         text_feat, inputs["text_padding_mask"])
        probs = jax.nn.softmax(out[ck][-1], axis=-1)[..., 0]
        return probs.max(axis=-1).sum(), out

    (_, out), grads = jax.value_and_grad(score_fn, has_aux=True)(x_mm)

    # Grad-CAM: ReLU(sum_c dS/dA_c * A_c)
    return np.asarray(jax.nn.relu((grads * x_mm).sum(-1)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--which-set", default="val")
    p.add_argument("--output-dir", default="cam_out")
    p.add_argument("--num", type=int, default=8)
    p.add_argument("--branch", default="token",
                   choices=["token", "decoder"])
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

    cam = compute_cam(model, params, inputs, args.branch, img_size,
                      family=cfg.model.get("type"))

    os.makedirs(args.output_dir, exist_ok=True)
    written = 0
    for i in range(min(args.num, cam.shape[0])):
        m = cam[i] / max(cam[i].max(), 1e-8)
        m = cv2.resize((m * 255).astype(np.uint8), (img_size, img_size))
        heat = cv2.applyColorMap(m, cv2.COLORMAP_JET)
        img = cv2.imread(batch["meta"][i]["filename"])
        img = cv2.resize(img, (img_size, img_size))
        vis = cv2.addWeighted(img, 0.55, heat, 0.45, 0)
        expr = (batch["meta"][i]["expression"] or "")[:60]
        cv2.putText(vis, expr, (4, 16), cv2.FONT_HERSHEY_SIMPLEX, 0.45,
                    (255, 255, 255), 1)
        cv2.imwrite(osp.join(args.output_dir, f"cam_{i:03d}.jpg"), vis)
        written += 1
    print(f"wrote {written} CAMs to {args.output_dir}")


if __name__ == "__main__":
    main()
