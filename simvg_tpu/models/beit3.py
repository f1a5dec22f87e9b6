"""BEiT-3 multiway multimodal encoder, TPU-first.

Re-designed from the reference's vendored torchscale stack
(simvg/models/vis_encs/beit/beit3_base.py:35-488, modeling_utils.py:21-109,
beit3.py:29-185) as a functional flax module:

- The reference's stateful ``set_split_position`` mutation
  (beit3_base.py:127-130) becomes a *static* split index: the joint
  sequence is always ``[CLS] + image patches + text tokens``, so every
  "multiway" module is two parameter sets (``A`` = vision, ``B`` = text)
  applied to static slices of the sequence — XLA sees two dense matmuls
  with static shapes, no gather/scatter.
- Attention runs over the concatenated sequence with a key-padding mask
  for padded text positions; softmax is computed in float32 (parity with
  torchscale's fp32 softmax), everything else in a configurable compute
  dtype (bfloat16 on TPU so matmuls hit the MXU natively).
- Fairseq position offset (+2, beit3_base.py:425-428) and the
  post-embedding zeroing of padded positions (beit3_base.py:367) are
  preserved exactly for checkpoint parity.

Config hyperparameters follow ``_get_base_config`` / ``_get_large_config``
(modeling_utils.py:21-70) with torchscale ``EncoderConfig`` defaults:
pre-LN, subln (inner attention LN + FFN LN), no embed scaling, no
layernorm_embedding, multiway, normalize_output.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from simvg_tpu.ops.attention import multihead_attention


@dataclasses.dataclass(frozen=True)
class BEiT3Config:
    img_size: int = 640
    patch_size: int = 32
    in_chans: int = 3
    vocab_size: int = 64010
    embed_dim: int = 768
    num_heads: int = 12
    ffn_dim: int = 3072
    num_layers: int = 12
    max_source_positions: int = 1024
    drop_path_rate: float = 0.1
    dropout: float = 0.0
    attention_dropout: float = 0.0
    layernorm_eps: float = 1e-5
    dtype: Any = jnp.float32  # compute dtype; params are always fp32
    attn_impl: str = "xla"  # "xla" | "pallas" (fused kernel)
    remat: bool = False  # rematerialise encoder layers (activation
    # checkpointing; trades FLOPs for HBM like the reference's
    # checkpoint_activations flag, beit3_base.py:311-312)
    scan_layers: bool = False  # lax.scan over the identical encoder
    # layers: ONE layer body in the compiled program instead of
    # num_layers copies — an order of magnitude smaller HLO, much
    # faster compiles (critical for remote-compiled environments).
    # Parameters become stacked [L, ...]; see
    # tools/convert_checkpoint.stack_scan_layers.

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def seq_vision(self) -> int:
        """CLS + patch tokens = the multiway split position."""
        return self.num_patches + 1

    @classmethod
    def base(cls, **kw) -> "BEiT3Config":
        """modeling_utils.py:21-44 hyperparameters."""
        return cls(embed_dim=768, num_heads=12, ffn_dim=3072, num_layers=12,
                   **kw)

    @classmethod
    def large(cls, **kw) -> "BEiT3Config":
        """modeling_utils.py:47-70 hyperparameters."""
        return cls(embed_dim=1024, num_heads=16, ffn_dim=4096, num_layers=24,
                   **kw)


def _dense(cfg: BEiT3Config, features: int, name: str) -> nn.Dense:
    return nn.Dense(
        features,
        dtype=cfg.dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.truncated_normal(0.02, lower=-2.0,
                                                     upper=2.0),
        name=name,
    )


def _ln(cfg: BEiT3Config, name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=cfg.layernorm_eps, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


def _multiway(module_a, module_b, x: jnp.ndarray, split: int) -> jnp.ndarray:
    """Apply A to the vision slice, B to the text slice, concat.

    Functional replacement for torchscale MultiwayWrapper +
    ``set_split_position`` (beit3_base.py:127-130): `split` is static,
    so both calls are static-shaped.
    """
    return jnp.concatenate([module_a(x[:, :split]), module_b(x[:, split:])],
                           axis=1)


class MultiwayFFN(nn.Module):
    """FeedForwardNetwork with subln (torchscale feedforward_network.py):
    fc1 -> gelu(exact) -> ffn_layernorm -> fc2, one parameter set per
    modality."""

    cfg: BEiT3Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, split: int) -> jnp.ndarray:
        cfg = self.cfg

        def one_way(tag):
            fc1 = _dense(cfg, cfg.ffn_dim, f"fc1_{tag}")
            fc2 = _dense(cfg, cfg.embed_dim, f"fc2_{tag}")
            ffn_ln = _ln(cfg, f"ffn_layernorm_{tag}")

            def f(h):
                h = fc1(h)
                h = jax.nn.gelu(h.astype(jnp.float32),
                                approximate=False).astype(cfg.dtype)
                h = ffn_ln(h).astype(cfg.dtype)
                return fc2(h)

            return f

        return _multiway(one_way("A"), one_way("B"), x, split)


class MultiwayAttention(nn.Module):
    """torchscale MultiheadAttention with multiway q/k/v/out projections
    and subln inner LayerNorm (multihead_attention.py in torchscale;
    instantiated at beit3_base.py:112-121)."""

    cfg: BEiT3Config

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        split: int,
        key_padding_mask: Optional[jnp.ndarray],
        deterministic: bool,
    ) -> jnp.ndarray:
        cfg = self.cfg

        def proj(tag):
            a = _dense(cfg, cfg.embed_dim, f"{tag}_proj_A")
            b = _dense(cfg, cfg.embed_dim, f"{tag}_proj_B")
            return lambda h: _multiway(a, b, h, split)

        q = proj("q")(x)
        k = proj("k")(x)
        v = proj("v")(x)

        out = multihead_attention(
            q, k, v,
            num_heads=cfg.num_heads,
            key_padding_mask=key_padding_mask,
            dropout_rate=cfg.attention_dropout,
            deterministic=deterministic,
            dropout_rng=None if deterministic or cfg.attention_dropout == 0.0
            else self.make_rng("dropout"),
            dtype=cfg.dtype,
            # the fused kernel has no prob-dropout path; fall back to XLA
            # when attention dropout is active (it is 0.0 in every
            # shipped config)
            impl=cfg.attn_impl
            if deterministic or cfg.attention_dropout == 0.0 else "xla",
        )

        inner_a = _ln(cfg, "inner_attn_ln_A")
        inner_b = _ln(cfg, "inner_attn_ln_B")
        out = _multiway(inner_a, inner_b, out, split).astype(cfg.dtype)

        out_a = _dense(cfg, cfg.embed_dim, "out_proj_A")
        out_b = _dense(cfg, cfg.embed_dim, "out_proj_B")
        return _multiway(out_a, out_b, out, split)


class DropPath(nn.Module):
    """Per-sample stochastic depth on a residual branch (torchscale
    DropPath, enabled with linspace(0, drop_path_rate, L) at
    beit3_base.py:44-48)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x / keep * mask


class EncoderLayer(nn.Module):
    """Pre-LN multiway transformer block (beit3_base.py:127-172)."""

    cfg: BEiT3Config
    drop_path_rate: float

    @nn.compact
    def __call__(self, x, split, key_padding_mask, deterministic):
        cfg = self.cfg
        ln1_a = _ln(cfg, "self_attn_layer_norm_A")
        ln1_b = _ln(cfg, "self_attn_layer_norm_B")
        ln2_a = _ln(cfg, "final_layer_norm_A")
        ln2_b = _ln(cfg, "final_layer_norm_B")
        drop_path = DropPath(self.drop_path_rate, name="drop_path")

        residual = x
        h = _multiway(ln1_a, ln1_b, x, split).astype(cfg.dtype)
        h = MultiwayAttention(cfg, name="self_attn")(
            h, split, key_padding_mask, deterministic
        )
        h = drop_path(h, deterministic)
        x = residual + h

        residual = x
        h = _multiway(ln2_a, ln2_b, x, split).astype(cfg.dtype)
        h = MultiwayFFN(cfg, name="ffn")(h, split)
        h = drop_path(h, deterministic)
        return residual + h


class _ScanLayerBody(nn.Module):
    """EncoderLayer variant for nn.scan: drop-path rate arrives as a
    traced per-layer input; split/deterministic are static attrs."""

    cfg: BEiT3Config
    split: int
    deterministic: bool

    @nn.compact
    def __call__(self, x, key_padding_mask, dp_rate):
        cfg = self.cfg
        split = self.split
        det = self.deterministic
        ln1_a = _ln(cfg, "self_attn_layer_norm_A")
        ln1_b = _ln(cfg, "self_attn_layer_norm_B")
        ln2_a = _ln(cfg, "final_layer_norm_A")
        ln2_b = _ln(cfg, "final_layer_norm_B")

        def drop_path(h):
            if det or cfg.drop_path_rate == 0.0:
                return h
            keep = 1.0 - dp_rate
            rng = self.make_rng("dropout")
            shape = (h.shape[0],) + (1,) * (h.ndim - 1)
            mask = jax.random.bernoulli(rng, keep, shape).astype(h.dtype)
            return h / keep * mask

        residual = x
        h = _multiway(ln1_a, ln1_b, x, split).astype(cfg.dtype)
        h = MultiwayAttention(cfg, name="self_attn")(
            h, split, key_padding_mask, det
        )
        x = residual + drop_path(h)

        residual = x
        h = _multiway(ln2_a, ln2_b, x, split).astype(cfg.dtype)
        h = MultiwayFFN(cfg, name="ffn")(h, split)
        # scan requires a dtype-stable carry
        return (residual + drop_path(h)).astype(cfg.dtype), None


class VisionEmbedding(nn.Module):
    """Conv patchify + CLS prepend (torchscale VisionEmbedding,
    used at beit3_base.py:417-424). Input is NHWC."""

    cfg: BEiT3Config

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            name="proj",
        )(images.astype(cfg.dtype))
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, d),
            jnp.float32
        )
        # mask_token exists in BEiT-3 checkpoints (contain_mask_token=True)
        # but is never used for REC; kept for converter completeness.
        self.param("mask_token", nn.initializers.zeros, (1, 1, d),
                   jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(cfg.dtype), (b, 1, d))
        return jnp.concatenate([cls, x], axis=1)


class BEiT3Encoder(nn.Module):
    """The joint vision-language encoder.

    __call__(images NHWC, text_ids [B,T], text_padding_mask [B,T] with
    1 = padded) -> (img_feat [B,P,D], text_feat [B,T,D], cls_feat [B,D]),
    the same contract as the reference's ``BEIT3.forward``
    (simvg/models/vis_encs/beit/beit3.py:176-185).
    """

    cfg: BEiT3Config

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        text_ids: jnp.ndarray,
        text_padding_mask: jnp.ndarray,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        split = cfg.seq_vision

        x_vis = VisionEmbedding(cfg, name="vision_embed")(images)
        assert x_vis.shape[1] == split, (x_vis.shape, split)

        text_embed = nn.Embed(
            cfg.vocab_size,
            cfg.embed_dim,
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(cfg.embed_dim ** -0.5),
            name="text_embed",
        )
        x_txt = text_embed(text_ids)

        # Fairseq-compatible learned positions, offset by +2
        # (beit3_base.py:425-432 + torchscale PositionalEmbedding default
        # positions = arange(2, L+2)).
        vis_pos_table = nn.Embed(
            split + 2, cfg.embed_dim, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="vision_pos_embed",
        )
        txt_pos_table = nn.Embed(
            cfg.max_source_positions, cfg.embed_dim, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="text_pos_embed",
        )
        t_txt = x_txt.shape[1]
        x_vis = x_vis + vis_pos_table(jnp.arange(2, split + 2))
        x_txt = x_txt + txt_pos_table(jnp.arange(2, t_txt + 2))

        x = jnp.concatenate([x_vis, x_txt], axis=1)

        pad = jnp.concatenate(
            [
                jnp.zeros((x.shape[0], split), bool),
                text_padding_mask.astype(bool),
            ],
            axis=1,
        )
        # Zero embeddings at padded positions (beit3_base.py:367).
        x = x * (1.0 - pad.astype(x.dtype))[..., None]

        dpr = np.linspace(0.0, cfg.drop_path_rate, cfg.num_layers)
        if cfg.scan_layers:
            body = _ScanLayerBody
            if cfg.remat:
                body = nn.remat(body, static_argnums=())
            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, 0),
                length=cfg.num_layers,
            )
            x, _ = scan(cfg, split, deterministic, name="layers")(
                x.astype(cfg.dtype), pad, jnp.asarray(dpr, jnp.float32)
            )
        else:
            layer_cls = (
                nn.remat(EncoderLayer, static_argnums=(2, 4))
                if cfg.remat else EncoderLayer
            )
            for i in range(cfg.num_layers):
                x = layer_cls(cfg, drop_path_rate=float(dpr[i]),
                              name=f"layers_{i}")(
                    x, split, pad, deterministic
                )

        # normalize_output=True -> final multiway LayerNorm
        # (beit3_base.py:227-230).
        x = _multiway(_ln(cfg, "layer_norm_A"), _ln(cfg, "layer_norm_B"),
                      x, split)

        cls_feat = x[:, 0]
        img_feat = x[:, 1:split]
        text_feat = x[:, split:]
        return img_feat, text_feat, cls_feat
