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


def adaptive_group_norm(ch: int, name: str) -> nn.GroupNorm:
    """GroupNorm with the group count adapted to narrow (test) widths:
    the largest of (32, 16, 8, 4, 2, 1) dividing ch.  Shared by every
    conv backbone (here and vis_enc_zoo)."""
    g = 32 if ch % 32 == 0 else max(
        gg for gg in (16, 8, 4, 2, 1) if ch % gg == 0
    )
    return nn.GroupNorm(num_groups=g, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


class ResNetEncoder(nn.Module):
    """Compact ResNet (vis_encs/resnet.py role): bottleneck stages with
    stride-32 output grid, matching the ViT interface.  Depths (3,4,6,3)
    = ResNet-50."""

    depths: tuple = (3, 4, 6, 3)
    widths: tuple = (256, 512, 1024, 2048)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        dd = dict(dtype=self.dtype, param_dtype=jnp.float32,
                  use_bias=False)

        def ln(name, ch):
            return adaptive_group_norm(ch, name)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    name="stem", **dd)(images.astype(self.dtype))
        x = nn.relu(ln("stem_norm", 64)(x).astype(self.dtype))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1),
                                                            (1, 1)))
        for si, (depth, width) in enumerate(zip(self.depths,
                                                self.widths)):
            for bi in range(depth):
                stride = 2 if (bi == 0 and si > 0) else 1
                res = x
                h = nn.Conv(width // 4, (1, 1), name=f"s{si}b{bi}c1",
                            **dd)(x)
                h = nn.relu(ln(f"s{si}b{bi}n1", width // 4)(h).astype(self.dtype))
                h = nn.Conv(width // 4, (3, 3), strides=(stride, stride),
                            padding=[(1, 1), (1, 1)],
                            name=f"s{si}b{bi}c2", **dd)(h)
                h = nn.relu(ln(f"s{si}b{bi}n2", width // 4)(h).astype(self.dtype))
                h = nn.Conv(width, (1, 1), name=f"s{si}b{bi}c3", **dd)(h)
                h = ln(f"s{si}b{bi}n3", width)(h).astype(self.dtype)
                if res.shape != h.shape:
                    res = nn.Conv(width, (1, 1),
                                  strides=(stride, stride),
                                  name=f"s{si}b{bi}sc", **dd)(res)
                    res = ln(f"s{si}b{bi}scn", width)(res).astype(self.dtype)
                x = nn.relu(res + h)
        return x


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
