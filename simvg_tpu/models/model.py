"""SimVG flagship model: BEiT-3 encoder + TGQS-KD-DETR head.

Equivalent of ``MIXDETRMB`` (simvg/models/det_seg/mix_detr_mb.py:13-190),
re-shaped for TPU:

- forward is a pure function of (params, batch, rng) with static shapes;
- per-sample metadata (img_shape, scale_factor) is carried as dense
  arrays, not python dicts;
- prediction decoding (best query, box clip, rescale) is vectorised on
  device instead of looping over detectron2 ``Instances``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from simvg_tpu.ops.boxes import box_cxcywh_to_xyxy, clip_boxes
from .beit3 import BEiT3Config, BEiT3Encoder
from .heads.tgqs_head import TGQSHeadConfig, TGQSKDDETRHead


@dataclasses.dataclass(frozen=True)
class SimVGConfig:
    beit3: BEiT3Config = dataclasses.field(default_factory=BEiT3Config)
    head: TGQSHeadConfig = dataclasses.field(default_factory=TGQSHeadConfig)

    @classmethod
    def vit_base_p32_640(cls, **head_kw) -> "SimVGConfig":
        """configs/single/ViT-base/*/...onestage.py model hyperparameters."""
        return cls(
            beit3=BEiT3Config.base(img_size=640, patch_size=32),
            head=TGQSHeadConfig(in_channels=768, **head_kw),
        )

    @classmethod
    def vit_large_p32_640(cls, **head_kw) -> "SimVGConfig":
        return cls(
            beit3=BEiT3Config.large(img_size=640, patch_size=32),
            head=TGQSHeadConfig(in_channels=1024, **head_kw),
        )


class SimVGModel(nn.Module):
    """Joint encoder + dual-branch grounding head.

    Batch dict contract (produced by simvg_tpu.data; mirrors the
    reference's CollectData keys, SURVEY.md §2.2):
        image:              float [B, H, W, 3] (normalised)
        text_ids:           int32 [B, T]
        text_padding_mask:  int32/bool [B, T]  (1 = padding)
        img_shape:          int32 [B, 2]  (h, w) valid extent within H, W
    """

    cfg: SimVGConfig

    def setup(self):
        self.vis_enc = BEiT3Encoder(self.cfg.beit3, name="beit3")
        self.head = TGQSKDDETRHead(self.cfg.head, name="head")

    def __call__(
        self,
        image: jnp.ndarray,
        text_ids: jnp.ndarray,
        text_padding_mask: jnp.ndarray,
        img_shape: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        branches: str = "both",
    ) -> Dict[str, jnp.ndarray]:
        b, h_img, w_img, _ = image.shape
        ps = self.cfg.beit3.patch_size
        h, w = h_img // ps, w_img // ps

        if not deterministic and not self.is_initializing():
            # serving-only levers must never run inside a training step
            # (ADVICE r3): int8 rounding has no straight-through
            # estimator, so encoder matmul gradients silently vanish;
            # token pruning gathers by training-time attention with
            # drop-path active and the decoder branch distills against
            # dummy outputs.  Refuse loudly instead of training wrong.
            # ValueError, not assert: these failures are silent
            # gradient death / silently-wrong training, so the guards
            # must survive `python -O` (ADVICE r4).
            if self.cfg.beit3.quant not in ("none", "int8_qat"):
                raise ValueError(
                    f"quant={self.cfg.beit3.quant!r} is a serving-only "
                    "flag: jnp.round/clip has zero gradient almost "
                    "everywhere (no STE), so training with it silently "
                    "kills encoder gradients.  For quantization-aware "
                    "training use quant='int8_qat' (fake-quant + STE), "
                    "then serve the checkpoint with int8_static")
            if self.cfg.beit3.token_prune_keep is not None:
                raise ValueError(
                    "token_prune_keep is a serving-only flag: the "
                    "pruning top-k would be driven by training-time "
                    "attention with drop-path active")

        prune = self.cfg.beit3.token_prune_keep is not None
        if prune:
            img_feat, text_feat, cls_feat, kept_idx = self.vis_enc(
                image, text_ids, text_padding_mask,
                deterministic=deterministic, return_prune_idx=True,
            )
        else:
            img_feat, text_feat, cls_feat = self.vis_enc(
                image, text_ids, text_padding_mask,
                deterministic=deterministic,
            )
        if prune:
            # pruned vision tokens no longer form the spatial grid the
            # decoder branch's memory/pos-embedding need — this is a
            # token-branch-only serving mode (BEiT3Config).  At APPLY
            # time "both" maps to "token" so the generic eval paths
            # work unchanged (the head then emits its explicitly-dummy
            # decoder outputs: zero logits, 0.5 boxes).  At INIT time
            # "both" is kept so every decoder parameter is still
            # created — restore templates must match FULL checkpoints
            # (pruning is a serving flag, not a different model).
            if branches == "both" and not self.is_initializing():
                # (non-deterministic applies were refused above)
                branches = "token"
            assert branches in ("token", "both"), (
                "token_prune_keep serves the token branch only; got "
                f"branches={branches!r}")
            # degenerate [B, K, 1, D] "grid": shape-compatible with the
            # head's pointwise input_proj, unused by the token branch
            x_mm = img_feat[:, :, None, :]
            # surviving tokens keep their REAL padding status (ADVICE
            # r3): gather the spatial mask rows at the kept indices so
            # patches in the padded canvas of non-square images stay
            # masked, matching the unpruned eval path
            full_mask = self._img_pad_mask(b, h_img, w_img, h, w,
                                           img_shape)  # [B,h,w]
            img_pad_mask = jnp.take_along_axis(
                full_mask.reshape(b, h * w), kept_idx, axis=1
            )[:, :, None]  # [B,K,1] — matches x_mm's grid dims
        else:
            # [B, P, D] -> NHWC grid (mix_detr_mb.py:52 builds NCHW; we
            # stay channels-last, the TPU-native layout).
            x_mm = img_feat.reshape(b, h, w, img_feat.shape[-1])
            img_pad_mask = self._img_pad_mask(b, h_img, w_img, h, w,
                                              img_shape)

        out = self.head(
            x_mm,
            img_pad_mask,
            cls_feat,
            text_feat,
            text_padding_mask,
            deterministic=deterministic,
            branches=branches,
        )
        return out

    def _img_pad_mask(self, b, h_img, w_img, h, w, img_shape):
        """Feature-grid padding mask from per-sample valid extents.

        Mirrors ``x_mask_pos_enc`` (tgqs_kd_detr_head.py:322-338): a pixel
        mask that is 0 inside ``img_shape`` and 1 in the padded region,
        downsampled to the feature grid with nearest interpolation.
        torch ``F.interpolate(mode="nearest")`` samples pixel
        ``floor(i * H_in / H_out)``; we index the same points.
        """
        if img_shape is None:
            return jnp.zeros((b, h, w), bool)
        ys = (jnp.arange(h) * (h_img // h))  # stride == patch size
        xs = (jnp.arange(w) * (w_img // w))
        valid_h = img_shape[:, 0][:, None]  # [B,1]
        valid_w = img_shape[:, 1][:, None]
        row_pad = ys[None, :] >= valid_h  # [B,h]
        col_pad = xs[None, :] >= valid_w  # [B,w]
        return row_pad[:, :, None] | col_pad[:, None, :]


def decode_predictions(
    class_logits: jnp.ndarray,  # [B, Q, C+1] final-layer logits
    boxes: jnp.ndarray,  # [B, Q, 4] cxcywh in [0,1]
    img_shape: jnp.ndarray,  # int32 [B, 2] (h, w)
    scale_factor: Optional[jnp.ndarray] = None,  # [B, 4] or None
) -> Dict[str, jnp.ndarray]:
    """Best-query box selection, the reference's inference path.

    Mirrors ``TextGuidedQuerySelectKDDETRHead.inference`` +
    ``MIXDETRMB.get_predictions`` (tgqs_kd_detr_head.py:577-604,
    mix_detr_mb.py:127-159): softmax over classes, drop the no-object
    column, take per-query max prob, scale boxes to image size, clip
    (detectron2 ``detector_postprocess`` reduces to a pure clip here since
    the output size equals the input size), pick the best-scoring query.

    Returns dict with:
        boxes   [B, Q, 4] xyxy in image scale (all queries; GRec eval
                needs them all)
        scores  [B, Q]
        labels  [B, Q]
        best_box [B, 4], best_score [B], best_label [B]
    """
    probs = jax.nn.softmax(class_logits.astype(jnp.float32), axis=-1)
    probs_obj = probs[..., :-1]  # drop no-object column
    scores = probs_obj.max(axis=-1)
    labels = probs_obj.argmax(axis=-1)

    hw = img_shape.astype(jnp.float32)
    scale = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], axis=-1)
    xyxy = box_cxcywh_to_xyxy(boxes) * scale[:, None, :]
    xyxy = clip_boxes(xyxy, hw[:, 0][:, None], hw[:, 1][:, None])
    if scale_factor is not None:
        xyxy = xyxy / scale_factor[:, None, :]

    best = jnp.argmax(scores, axis=-1)

    def take(a):
        idx = best.reshape(best.shape[0], *([1] * (a.ndim - 1)))
        return jnp.take_along_axis(a, idx, axis=1).squeeze(1)
    return {
        "boxes": xyxy,
        "scores": scores,
        "labels": labels,
        "best_box": take(xyxy),
        "best_score": take(scores),
        "best_label": take(labels),
    }
