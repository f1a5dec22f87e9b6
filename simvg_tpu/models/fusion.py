"""Vision-language fusion modules (the reference's FUSIONS registry
slot, simvg/models/builder.py:1-36).  SimVG sets ``fusion=None`` (the
BEiT-3 encoder fuses modalities internally); this cross-attention fusion
serves SeqTR-style compositions of separate vis/lan encoders."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from simvg_tpu.ops.attention import multihead_attention


class CrossAttentionFusion(nn.Module):
    """Image grid attends to text features; residual + LN."""

    embed_dim: int = 256
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_feat, text_feat, text_mask=None):
        """img_feat [B, h, w, C]; text_feat [B, T, Ct] ->
        fused [B, h, w, embed_dim]."""
        dd = dict(dtype=self.dtype, param_dtype=jnp.float32)
        b, h, w, _ = img_feat.shape
        x = nn.Dense(self.embed_dim, name="img_proj", **dd)(
            img_feat).reshape(b, h * w, self.embed_dim)
        t = nn.Dense(self.embed_dim, name="text_proj", **dd)(text_feat)
        q = nn.Dense(self.embed_dim, name="q", **dd)(x)
        k = nn.Dense(self.embed_dim, name="k", **dd)(t)
        v = nn.Dense(self.embed_dim, name="v", **dd)(t)
        a = multihead_attention(q, k, v, num_heads=self.num_heads,
                                key_padding_mask=text_mask,
                                dtype=self.dtype)
        x = x + nn.Dense(self.embed_dim, name="out", **dd)(a)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln")(x)
        return x.reshape(b, h, w, self.embed_dim).astype(self.dtype)


class ComposedOneStageModel(nn.Module):
    """OneStageModel composition (simvg/models/det_seg/one_stage.py:6-25):
    separate vis_enc + lan_enc + fusion + DETR head."""

    vis_enc: nn.Module
    lan_enc: nn.Module
    fusion: nn.Module
    head: nn.Module

    def __call__(self, image, text_ids, text_padding_mask=None,
                 img_shape=None, img_pad_mask=None,
                 deterministic: bool = True):
        """Same keyword surface as SimVGModel (image/text_ids/
        text_padding_mask/img_shape) so build_model callers can drive
        either family; text_padding_mask and img_shape are accepted for
        interface parity (the legacy lan_encs derive the text mask from
        the zero-padded word ids themselves, loading.py framing)."""
        del text_padding_mask, img_shape  # see docstring
        feat = self.vis_enc(image, deterministic=deterministic)
        lang = self.lan_enc(text_ids)
        if isinstance(lang, dict):
            text_feat, text_mask = lang["text_feat"], lang["text_mask"]
        else:
            # pooled lan_enc modes (max/mean/default/query) return a
            # [B, N, C] array of pooled vectors with no padding
            text_feat = lang
            text_mask = jnp.zeros(lang.shape[:2], bool)
        fused = self.fusion(feat, text_feat, text_mask)
        if img_pad_mask is None:
            b, h, w, _ = fused.shape
            img_pad_mask = jnp.zeros((b, h, w), bool)
        return self.head(fused, img_pad_mask,
                         deterministic=deterministic)
