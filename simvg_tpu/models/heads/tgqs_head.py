"""Text-guided query-selection knowledge-distillation DETR head.

TPU-native redesign of ``TextGuidedQuerySelectKDDETRHead``
(simvg/models/heads/tgqs_kd_detr_head/tgqs_kd_detr_head.py:22-604).

The forward here is pure (no loss computation — losses live in
``simvg_tpu.losses.criterion`` and are orchestrated by the train step):
it produces the decoder-branch and token-branch class/box predictions with
static shapes.  Image features come in as an NHWC grid.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from simvg_tpu.ops.sine_embed import (
    sine_position_embedding_1d_ref,
    sine_position_embedding_2d,
)
from .detr_transformer import DetrDecoder, DetrEncoder


@dataclasses.dataclass(frozen=True)
class TGQSHeadConfig:
    """Mirrors the reference head's constructor arguments
    (tgqs_kd_detr_head.py:24-48) restricted to what the shipped configs
    exercise (configs/single/ViT-base/refcoco/refcoco_onestage.py:83-104).
    """

    num_queries: int = 1
    in_channels: int = 768
    embed_dim: int = 256
    num_classes: int = 1
    text_max_token: int = 20
    num_encoder_layers: int = 6
    num_decoder_layers: int = 3
    num_tgqg_layers: int = 2
    only_decoder: bool = True
    num_token_mlp_layers: int = 1
    text_guided_query_generation: bool = True
    tgqs_mid_dim: int = 512
    share_predicthead: bool = False
    attn_dropout: float = 0.1
    ffn_dropout: float = 0.1
    dtype: Any = jnp.float32


class MLP(nn.Module):
    """Linear->ReLU stack (simvg/models/heads/utils.py:7-46); optionally
    returns stacked per-layer intermediates like the reference's
    ``return_intermediate`` for the token branch."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    return_intermediate: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.return_intermediate and self.num_layers > 1:
            # intermediates are stacked, so every layer's output width
            # must equal output_dim (the reference's token-branch usage;
            # a mixed-width stack would fail deep inside jnp.stack)
            assert self.hidden_dim == self.output_dim, (
                "MLP(return_intermediate=True) requires "
                f"hidden_dim == output_dim, got {self.hidden_dim} vs "
                f"{self.output_dim}")
        dd = dict(dtype=self.dtype, param_dtype=jnp.float32)
        outs = []
        for i in range(self.num_layers):
            feat = (
                self.output_dim
                if i == self.num_layers - 1
                else self.hidden_dim
            )
            x = nn.Dense(feat, name=f"layers_{i}", **dd)(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
            outs.append(x)
        if self.return_intermediate:
            return jnp.stack(outs, axis=0)
        return x


class TGQSKDDETRHead(nn.Module):
    cfg: TGQSHeadConfig

    @nn.compact
    def __call__(
        self,
        x_mm: jnp.ndarray,  # [B, h, w, in_channels] image-token grid
        img_pad_mask: jnp.ndarray,  # bool [B, h, w]; True = padded cell
        cls_feat: jnp.ndarray,  # [B, in_channels]
        text_feat: jnp.ndarray,  # [B, T, in_channels]
        text_mask: jnp.ndarray,  # [B, T]; nonzero = padded token
        deterministic: bool = True,
        branches: str = "both",  # "both" | "token" | "decoder";
        # "token" skips the DETR decoder entirely — the paper's fast
        # serving path (token branch only).
    ):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=jnp.float32)
        b, h, w, _ = x_mm.shape

        # share_predicthead (tgqs_kd_detr_head.py:109-118): one set of
        # class/box heads serves both branches.
        class_head_dec = nn.Dense(cfg.num_classes + 1,
                                  name="class_embed_decoder", **dd)
        bbox_head_dec = MLP(cfg.embed_dim, 4, 3, dtype=cfg.dtype,
                            name="bbox_embed_decoder")
        if cfg.share_predicthead:
            class_head_tok, bbox_head_tok = class_head_dec, bbox_head_dec
        else:
            class_head_tok = nn.Dense(cfg.num_classes + 1,
                                      name="class_embed_token", **dd)
            bbox_head_tok = MLP(cfg.embed_dim, 4, 3, dtype=cfg.dtype,
                                name="bbox_embed_token")

        # Input projections (tgqs_kd_detr_head.py:74-76, 377-379).  The
        # reference's 1x1 Conv2d == a Dense over the channel axis.
        x = nn.Dense(cfg.embed_dim, name="input_proj", **dd)(x_mm)
        text = nn.Dense(cfg.embed_dim, name="input_text_proj", **dd)(
            text_feat
        )
        cls = nn.Dense(cfg.embed_dim, name="input_cls_proj", **dd)(cls_feat)[
            :, None, :
        ]

        # 2-D sine positions from the image padding mask
        # (x_mask_pos_enc, tgqs_kd_detr_head.py:322-338).
        pos_embed = sine_position_embedding_2d(
            img_pad_mask, cfg.embed_dim // 2
        ).astype(cfg.dtype)

        cls_q = jnp.broadcast_to(cls, (b, cfg.num_queries, cfg.embed_dim))

        query_embed_table = self.param(
            "query_embed",
            nn.initializers.normal(1.0),
            (cfg.num_queries, cfg.embed_dim),
            jnp.float32,
        )
        query_embed_input = jnp.broadcast_to(
            query_embed_table.astype(cfg.dtype)[None],
            (b, cfg.num_queries, cfg.embed_dim),
        )

        if cfg.text_guided_query_generation:
            # Max-pool text features over non-padded tokens
            # (tgqs_kd_detr_head.py:386).
            text_valid = (text_mask == 0)[..., None]
            neg = jnp.asarray(-1e30, text.dtype)
            text_feat_filter = jnp.max(
                jnp.where(text_valid, text, neg), axis=1, keepdims=True
            )
            text_feat_filter = jnp.broadcast_to(
                text_feat_filter, (b, cfg.num_queries, cfg.embed_dim)
            )

            text_pos = sine_position_embedding_1d_ref(
                text.shape[1], cfg.embed_dim
            ).astype(cfg.dtype)[None]

            tgqg_out = DetrDecoder(
                embed_dim=cfg.embed_dim,
                num_heads=8,
                feedforward_dim=cfg.tgqs_mid_dim,
                num_layers=cfg.num_tgqg_layers,
                attn_dropout=cfg.attn_dropout,
                ffn_dropout=cfg.ffn_dropout,
                post_norm=True,
                return_intermediate=False,
                dtype=cfg.dtype,
                name="tgqg",
            )(
                jnp.zeros_like(query_embed_input),
                text,
                query_pos=query_embed_input,
                key_pos=text_pos,
                key_padding_mask=text_mask,
                deterministic=deterministic,
            )[0]
            # (tgqs_kd_detr_head.py:398-399)
            query_embed = tgqg_out + text_feat_filter + query_embed_input
            cls_q = query_embed + cls_q
        else:
            query_embed = query_embed_input

        # ---- token branch (tgqs_kd_detr_head.py:411-420)
        if branches != "decoder":
            if cfg.num_token_mlp_layers > 0:
                token_feats = MLP(
                    cfg.embed_dim,
                    cfg.embed_dim,
                    cfg.num_token_mlp_layers,
                    return_intermediate=True,
                    dtype=cfg.dtype,
                    name="mlp",
                )(cls_q)  # [L_mlp, B, Q, D]
            else:
                token_feats = cls_q[None]
            class_token = class_head_tok(token_feats)
            bbox_token = nn.sigmoid(
                bbox_head_tok(token_feats).astype(jnp.float32)
            )
        else:
            token_feats = cls_q[None]
            class_token = jnp.zeros(
                (1, b, cfg.num_queries, cfg.num_classes + 1), jnp.float32
            )
            bbox_token = jnp.full((1, b, cfg.num_queries, 4), 0.5,
                                  jnp.float32)

        # ---- decoder branch (tgqs_kd_detr_head.py:425-433)
        if branches != "token":
            memory = x.reshape(b, h * w, cfg.embed_dim)
            mem_pos = pos_embed.reshape(b, h * w, cfg.embed_dim)
            mem_mask = img_pad_mask.reshape(b, h * w)
            if not cfg.only_decoder:
                memory = DetrEncoder(
                    embed_dim=cfg.embed_dim,
                    num_heads=8,
                    feedforward_dim=2048,
                    num_layers=cfg.num_encoder_layers,
                    attn_dropout=cfg.attn_dropout,
                    ffn_dropout=cfg.ffn_dropout,
                    post_norm=False,
                    dtype=cfg.dtype,
                    name="encoder",
                )(memory, query_pos=mem_pos,
                  query_key_padding_mask=mem_mask,
                  deterministic=deterministic)

            hidden_states = DetrDecoder(
                embed_dim=cfg.embed_dim,
                num_heads=8,
                feedforward_dim=2048,
                num_layers=cfg.num_decoder_layers,
                attn_dropout=cfg.attn_dropout,
                ffn_dropout=cfg.ffn_dropout,
                post_norm=True,
                return_intermediate=True,
                dtype=cfg.dtype,
                name="decoder",
            )(
                jnp.zeros_like(query_embed),
                memory,
                query_pos=query_embed,
                key_pos=mem_pos,
                key_padding_mask=mem_mask,
                deterministic=deterministic,
            )  # [L_dec, B, Q, D]

            class_decoder = class_head_dec(hidden_states)
            bbox_decoder = nn.sigmoid(
                bbox_head_dec(hidden_states).astype(jnp.float32)
            )
        else:
            ld = cfg.num_decoder_layers
            hidden_states = jnp.zeros(
                (ld, b, cfg.num_queries, cfg.embed_dim), cfg.dtype
            )
            class_decoder = jnp.zeros(
                (ld, b, cfg.num_queries, cfg.num_classes + 1), jnp.float32
            )
            bbox_decoder = jnp.full((ld, b, cfg.num_queries, 4), 0.5,
                                    jnp.float32)

        return {
            # [L, B, Q, C+1] / [L, B, Q, 4]; last layer = final prediction
            "class_decoder": class_decoder.astype(jnp.float32),
            "bbox_decoder": bbox_decoder,
            "class_token": class_token.astype(jnp.float32),
            "bbox_token": bbox_token,
            "token_features": token_feats,
            "decoder_features": hidden_states,
        }
