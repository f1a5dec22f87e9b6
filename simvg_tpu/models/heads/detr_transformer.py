"""Post-norm DETR transformer encoder/decoder layers.

Functional equivalents of the reference's detrex stack
(simvg/models/heads/tgqs_kd_detr_head/transformer.py:22-235, which builds
detrex ``BaseTransformerLayer`` with operation orders
("self_attn","norm","ffn","norm") and
("self_attn","norm","cross_attn","norm","ffn","norm")):

- attention = torch ``nn.MultiheadAttention`` semantics (packed q/k/v
  projection with bias, output projection, prob dropout), with positional
  embeddings added to q/k only (not v), and the residual taken from the
  *pre-positional* query (detrex MultiheadAttention adds ``identity``);
- FFN = Linear -> ReLU -> Dropout -> Linear -> Dropout with residual;
- all norms post-residual (post-norm);
- the decoder optionally returns the stack of per-layer outputs, each
  passed through the shared ``post_norm_layer`` (transformer.py:166-186).

Everything is batch-first [B, S, D]; the reference's seq-first layout is a
torch idiosyncrasy with no TPU benefit.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from simvg_tpu.ops.attention import multihead_attention


class DetrAttention(nn.Module):
    """nn.MultiheadAttention-style attention with residual from identity."""

    embed_dim: int
    num_heads: int
    attn_dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        query_pos: Optional[jnp.ndarray],
        key_pos: Optional[jnp.ndarray],
        key_padding_mask: Optional[jnp.ndarray],
        deterministic: bool,
    ) -> jnp.ndarray:
        dd = dict(dtype=self.dtype, param_dtype=jnp.float32)
        q_in = query if query_pos is None else query + query_pos
        k_in = key if key_pos is None else key + key_pos

        q = nn.Dense(self.embed_dim, name="q_proj", **dd)(q_in)
        k = nn.Dense(self.embed_dim, name="k_proj", **dd)(k_in)
        v = nn.Dense(self.embed_dim, name="v_proj", **dd)(value)

        out, weights = multihead_attention(
            q, k, v,
            num_heads=self.num_heads,
            key_padding_mask=key_padding_mask,
            dropout_rate=self.attn_dropout,
            deterministic=deterministic,
            dropout_rng=None
            if deterministic or self.attn_dropout == 0.0
            else self.make_rng("dropout"),
            dtype=self.dtype,
            return_weights=True,
        )
        # Exposed for attention visualisation (the reference hooks
        # `visualizer.get_local`, apis/inference.py:107-137); only
        # materialised when apply() makes "intermediates" mutable.
        self.sow("intermediates", "attn_weights", weights)
        out = nn.Dense(self.embed_dim, name="out_proj", **dd)(out)
        return query + out  # identity residual (detrex MultiheadAttention)


class DetrFFN(nn.Module):
    """detrex FFN: Linear -> ReLU -> Drop -> Linear -> Drop, + residual."""

    embed_dim: int
    feedforward_dim: int
    ffn_dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        dd = dict(dtype=self.dtype, param_dtype=jnp.float32)
        h = nn.Dense(self.feedforward_dim, name="fc1", **dd)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.ffn_dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.embed_dim, name="fc2", **dd)(h)
        h = nn.Dropout(self.ffn_dropout, deterministic=deterministic)(h)
        return x + h


def _ln(name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


class DetrEncoderLayer(nn.Module):
    """("self_attn","norm","ffn","norm") post-norm layer."""

    embed_dim: int
    num_heads: int
    feedforward_dim: int
    attn_dropout: float
    ffn_dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, query_pos, query_key_padding_mask, deterministic):
        x = DetrAttention(self.embed_dim, self.num_heads, self.attn_dropout,
                          self.dtype, name="self_attn")(
            x, x, x, query_pos, query_pos, query_key_padding_mask,
            deterministic)
        x = _ln("norm1")(x).astype(self.dtype)
        x = DetrFFN(self.embed_dim, self.feedforward_dim, self.ffn_dropout,
                    self.dtype, name="ffn")(x, deterministic)
        x = _ln("norm2")(x).astype(self.dtype)
        return x


class DetrDecoderLayer(nn.Module):
    """("self_attn","norm","cross_attn","norm","ffn","norm") layer."""

    embed_dim: int
    num_heads: int
    feedforward_dim: int
    attn_dropout: float
    ffn_dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory, query_pos, key_pos, key_padding_mask,
                 deterministic):
        x = DetrAttention(self.embed_dim, self.num_heads, self.attn_dropout,
                          self.dtype, name="self_attn")(
            x, x, x, query_pos, query_pos, None, deterministic)
        x = _ln("norm1")(x).astype(self.dtype)
        x = DetrAttention(self.embed_dim, self.num_heads, self.attn_dropout,
                          self.dtype, name="cross_attn")(
            x, memory, memory, query_pos, key_pos, key_padding_mask,
            deterministic)
        x = _ln("norm2")(x).astype(self.dtype)
        x = DetrFFN(self.embed_dim, self.feedforward_dim, self.ffn_dropout,
                    self.dtype, name="ffn")(x, deterministic)
        x = _ln("norm3")(x).astype(self.dtype)
        return x


class DetrEncoder(nn.Module):
    """DetrTransformerEncoder (transformer.py:22-90); post_norm=False in
    the reference config, so ``post_norm`` defaults off."""

    embed_dim: int = 256
    num_heads: int = 8
    feedforward_dim: int = 2048
    num_layers: int = 6
    attn_dropout: float = 0.1
    ffn_dropout: float = 0.1
    post_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, query_pos=None, query_key_padding_mask=None,
                 deterministic=True):
        for i in range(self.num_layers):
            x = DetrEncoderLayer(
                self.embed_dim, self.num_heads, self.feedforward_dim,
                self.attn_dropout, self.ffn_dropout, self.dtype,
                name=f"layers_{i}",
            )(x, query_pos, query_key_padding_mask, deterministic)
        if self.post_norm:
            x = _ln("post_norm_layer")(x).astype(self.dtype)
        return x


class DetrDecoder(nn.Module):
    """DetrTransformerDecoder (transformer.py:93-186).

    With ``return_intermediate`` the output is [L, B, Q, D]: every layer's
    output through the shared post-norm, exactly like the reference's
    stacked intermediates.
    """

    embed_dim: int = 256
    num_heads: int = 8
    feedforward_dim: int = 2048
    num_layers: int = 6
    attn_dropout: float = 0.1
    ffn_dropout: float = 0.1
    post_norm: bool = True
    return_intermediate: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, memory, query_pos=None, key_pos=None,
                 key_padding_mask=None, deterministic=True):
        post = _ln("post_norm_layer") if self.post_norm else None
        intermediate = []
        x = query
        for i in range(self.num_layers):
            x = DetrDecoderLayer(
                self.embed_dim, self.num_heads, self.feedforward_dim,
                self.attn_dropout, self.ffn_dropout, self.dtype,
                name=f"layers_{i}",
            )(x, memory, query_pos, key_pos, key_padding_mask, deterministic)
            if self.return_intermediate:
                intermediate.append(
                    post(x).astype(self.dtype) if post is not None else x
                )
        if self.return_intermediate:
            return jnp.stack(intermediate, axis=0)
        if post is not None:
            x = post(x).astype(self.dtype)
        return x[None]
