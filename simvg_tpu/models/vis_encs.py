"""Standalone vision encoders (the reference's legacy vis_enc zoo slot,
simvg/models/vis_encs/*: ViT/ResNet/Swin/PVT/... SeqTR-era backbones).

SimVG itself always uses the joint BEiT-3 encoder; these exist for
SeqTR-style compositions (vis_enc + lan_enc + fusion + head).  Round 1
ships the transformer backbone (ViT); convolutional backbones are
mechanical additions on the same interface:
    __call__(images NHWC) -> feature grid [B, h, w, C].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from simvg_tpu.ops.attention import multihead_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 640
    patch_size: int = 32
    embed_dim: int = 768
    num_heads: int = 12
    ffn_dim: int = 3072
    num_layers: int = 12
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32


class ViTEncoder(nn.Module):
    """Plain pre-LN ViT over image patches (vis_encs/vit.py role)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=jnp.float32)
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    padding="VALID", name="patch_embed", **dd)(
            images.astype(cfg.dtype))
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h * w, d), jnp.float32)
        x = x + pos.astype(cfg.dtype)

        for i in range(cfg.num_layers):
            hdd = nn.LayerNorm(dtype=jnp.float32,
                               name=f"ln1_{i}")(x).astype(cfg.dtype)
            q = nn.Dense(d, name=f"q_{i}", **dd)(hdd)
            k = nn.Dense(d, name=f"k_{i}", **dd)(hdd)
            v = nn.Dense(d, name=f"v_{i}", **dd)(hdd)
            a = multihead_attention(q, k, v, num_heads=cfg.num_heads,
                                    dtype=cfg.dtype)
            x = x + nn.Dense(d, name=f"proj_{i}", **dd)(a)
            hdd = nn.LayerNorm(dtype=jnp.float32,
                               name=f"ln2_{i}")(x).astype(cfg.dtype)
            hdd = nn.Dense(cfg.ffn_dim, name=f"fc1_{i}", **dd)(hdd)
            hdd = jax.nn.gelu(hdd.astype(jnp.float32),
                              approximate=False).astype(cfg.dtype)
            x = x + nn.Dense(d, name=f"fc2_{i}", **dd)(hdd)

        x = nn.LayerNorm(dtype=jnp.float32, name="ln_final")(x)
        return x.reshape(b, h, w, d).astype(cfg.dtype)
