"""Plain DETR head — the reference's simpler alternative to the TGQS
head (simvg/models/heads/detr_head/detr_head.py:17-229): learned object
queries, optional encoder, single class/box prediction branch.  Loss
orchestration reuses the same batched SetCriterion."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from simvg_tpu.ops.sine_embed import sine_position_embedding_2d
from .detr_transformer import DetrDecoder, DetrEncoder
from .tgqs_head import MLP


@dataclasses.dataclass(frozen=True)
class DETRHeadConfig:
    num_queries: int = 100
    in_channels: int = 768
    embed_dim: int = 256
    num_classes: int = 1
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    only_decoder: bool = False
    attn_dropout: float = 0.1
    ffn_dropout: float = 0.1
    dtype: Any = jnp.float32


class DETRHead(nn.Module):
    cfg: DETRHeadConfig

    @nn.compact
    def __call__(self, x_mm, img_pad_mask, deterministic: bool = True):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=jnp.float32)
        b, h, w, _ = x_mm.shape

        x = nn.Dense(cfg.embed_dim, name="input_proj", **dd)(x_mm)
        pos = sine_position_embedding_2d(
            img_pad_mask, cfg.embed_dim // 2
        ).astype(cfg.dtype)

        memory = x.reshape(b, h * w, cfg.embed_dim)
        mem_pos = pos.reshape(b, h * w, cfg.embed_dim)
        mem_mask = img_pad_mask.reshape(b, h * w)
        if not cfg.only_decoder:
            memory = DetrEncoder(
                embed_dim=cfg.embed_dim,
                num_layers=cfg.num_encoder_layers,
                attn_dropout=cfg.attn_dropout,
                ffn_dropout=cfg.ffn_dropout,
                dtype=cfg.dtype,
                name="encoder",
            )(memory, query_pos=mem_pos, query_key_padding_mask=mem_mask,
              deterministic=deterministic)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (cfg.num_queries, cfg.embed_dim), jnp.float32,
        )
        qe = jnp.broadcast_to(query_embed.astype(cfg.dtype)[None],
                              (b, cfg.num_queries, cfg.embed_dim))

        hs = DetrDecoder(
            embed_dim=cfg.embed_dim,
            num_layers=cfg.num_decoder_layers,
            attn_dropout=cfg.attn_dropout,
            ffn_dropout=cfg.ffn_dropout,
            post_norm=True,
            return_intermediate=True,
            dtype=cfg.dtype,
            name="decoder",
        )(jnp.zeros_like(qe), memory, query_pos=qe, key_pos=mem_pos,
          key_padding_mask=mem_mask, deterministic=deterministic)

        cls = nn.Dense(cfg.num_classes + 1, name="class_embed", **dd)(hs)
        box = nn.sigmoid(
            MLP(cfg.embed_dim, 4, 3, dtype=cfg.dtype,
                name="bbox_embed")(hs).astype(jnp.float32)
        )
        return {
            "class_decoder": cls.astype(jnp.float32),
            "bbox_decoder": box,
            # no token branch: aliases keep the loss/eval plumbing uniform
            "class_token": cls[-1:].astype(jnp.float32),
            "bbox_token": box[-1:],
        }
