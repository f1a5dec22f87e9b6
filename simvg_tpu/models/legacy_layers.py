"""SeqTR/MDETR legacy transformer layers (reference core/layers/).

The reference carries two SeqTR-era modules unused by every shipped
SimVG config but present in its inventory:

- ``AutoRegressiveTransformer`` (core/layers/transformer.py:310-448):
  1x1-conv + GroupNorm input projection, post-norm torch
  TransformerEncoder over the flattened feature map (sine-2D positions
  on q/k), and a causally-masked post-norm decoder over quantized
  coordinate-token embeddings (learned 1D positions) — SeqTR's
  sequence-generation box/mask head.
- ``MDETRTransformer`` (core/layers/mdetr_transformer.py:24-159):
  the same encoder/decoder pair where the encoder memory is the
  concatenation of image tokens and resized text features.

Re-implemented natively as flax modules with static shapes; greedy
generation re-runs the jitted decode at a fixed sequence length
instead of torch-style dynamic incremental decoding.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from simvg_tpu.ops.attention import multihead_attention
from simvg_tpu.ops.sine_embed import sine_position_embedding_2d


def _ln(name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


def causal_mask(length: int) -> jnp.ndarray:
    """tri_mask (transformer.py:357-361): additive [L, L], 0 on/below
    the diagonal, -inf above."""
    allowed = jnp.tril(jnp.ones((length, length), bool))
    return jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)


class _Attn(nn.Module):
    """q/k/v/out projection + attention with optional additive mask
    (torch nn.MultiheadAttention semantics)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, *, query_pos=None,
                 key_pos=None, key_padding_mask=None, attn_bias=None,
                 deterministic=True):
        dd = dict(dtype=self.dtype, param_dtype=jnp.float32)
        q_in = query if query_pos is None else query + query_pos
        k_in = key if key_pos is None else key + key_pos
        q = nn.Dense(self.embed_dim, name="q_proj", **dd)(q_in)
        k = nn.Dense(self.embed_dim, name="k_proj", **dd)(k_in)
        v = nn.Dense(self.embed_dim, name="v_proj", **dd)(value)
        out = multihead_attention(
            q, k, v,
            num_heads=self.num_heads,
            key_padding_mask=key_padding_mask,
            attn_bias=attn_bias,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dropout_rng=None if deterministic or self.dropout == 0.0
            else self.make_rng("dropout"),
            dtype=self.dtype,
        )
        return nn.Dense(self.embed_dim, name="out_proj", **dd)(out)


class _FFN(nn.Module):
    embed_dim: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        dd = dict(dtype=self.dtype, param_dtype=jnp.float32)
        h = nn.relu(nn.Dense(self.ffn_dim, name="fc1", **dd)(x))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.embed_dim, name="fc2", **dd)(h)
        return h


class EncoderLayer1D(nn.Module):
    """Post-norm torch TransformerEncoderLayer with positions on q/k
    (TransformerEncoderLayerWithPositionEmbedding,
    transformer.py:169-181)."""

    embed_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, key_padding_mask, deterministic=True):
        h = _Attn(self.embed_dim, self.num_heads, self.dropout,
                  self.dtype, name="self_attn")(
            x, x, x, query_pos=pos, key_pos=pos,
            key_padding_mask=key_padding_mask,
            deterministic=deterministic)
        x = _ln("norm1")(x + h).astype(self.dtype)
        h = _FFN(self.embed_dim, self.ffn_dim, self.dropout,
                 self.dtype, name="ffn")(x, deterministic)
        return _ln("norm2")(x + h).astype(self.dtype)


class DecoderLayer1D(nn.Module):
    """Post-norm torch TransformerDecoderLayer: causal self-attn
    (query positions), cross-attn to memory (memory positions on k)
    (TransformerDecoderLayerWithPositionEmbedding,
    transformer.py:200-246)."""

    embed_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, *, query_pos, memory_pos,
                 memory_key_padding_mask, tgt_mask, deterministic=True):
        h = _Attn(self.embed_dim, self.num_heads, self.dropout,
                  self.dtype, name="self_attn")(
            tgt, tgt, tgt, query_pos=query_pos, key_pos=query_pos,
            attn_bias=tgt_mask, deterministic=deterministic)
        tgt = _ln("norm1")(tgt + h).astype(self.dtype)
        h = _Attn(self.embed_dim, self.num_heads, self.dropout,
                  self.dtype, name="cross_attn")(
            tgt, memory, memory, query_pos=query_pos,
            key_pos=memory_pos,
            key_padding_mask=memory_key_padding_mask,
            deterministic=deterministic)
        tgt = _ln("norm2")(tgt + h).astype(self.dtype)
        h = _FFN(self.embed_dim, self.ffn_dim, self.dropout,
                 self.dtype, name="ffn")(tgt, deterministic)
        return _ln("norm3")(tgt + h).astype(self.dtype)


class FeatureResizer(nn.Module):
    """Linear -> LN -> dropout (transformer.py:287-307)."""

    output_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.output_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc")(x)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         param_dtype=jnp.float32,
                         name="layer_norm")(x).astype(self.dtype)
        return nn.Dropout(self.dropout,
                          deterministic=deterministic)(x)


class AutoRegressiveTransformer(nn.Module):
    """SeqTR sequence-generation transformer
    (core/layers/transformer.py:310-448).

    forward_encoder: [B, H, W, C] feature map -> input_proj (1x1 conv +
    GroupNorm-32) -> encoder with sine-2D positions -> memory.
    forward_decoder: causally-masked decode of coordinate-token
    embeddings against the memory.  ``generate`` runs fixed-length
    greedy decoding under jit.
    """

    d_model: int = 256
    num_heads: int = 8
    ffn_dim: int = 1024
    num_encoder_layers: int = 6
    num_decoder_layers: int = 3
    vocab_size: int = 1001 + 2  # num_bins + 1 + eos (SeqTR default)
    max_seq_len: int = 5  # 4 box-corner tokens + eos
    dropout: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        self.input_proj = nn.Conv(self.d_model, (1, 1),
                                  dtype=self.dtype,
                                  param_dtype=jnp.float32)
        self.input_norm = nn.GroupNorm(num_groups=32,
                                       dtype=jnp.float32,
                                       param_dtype=jnp.float32)
        self.encoder_layers = [
            EncoderLayer1D(self.d_model, self.num_heads, self.ffn_dim,
                           self.dropout, self.dtype)
            for _ in range(self.num_encoder_layers)]
        self.decoder_layers = [
            DecoderLayer1D(self.d_model, self.num_heads, self.ffn_dim,
                           self.dropout, self.dtype)
            for _ in range(self.num_decoder_layers)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5,
                                         dtype=jnp.float32,
                                         param_dtype=jnp.float32)
        self.query_embedding = nn.Embed(self.vocab_size, self.d_model,
                                        dtype=self.dtype,
                                        param_dtype=jnp.float32)
        self.seq_pos = nn.Embed(self.max_seq_len, self.d_model,
                                dtype=self.dtype,
                                param_dtype=jnp.float32)
        self.predictor = nn.Dense(self.vocab_size, dtype=jnp.float32,
                                  param_dtype=jnp.float32)

    def forward_encoder(self, x, x_mask=None, deterministic=True):
        """x: [B, H, W, C]; x_mask: [B, H, W] (True = padded) ->
        (memory [B, HW, D], pos [B, HW, D], flat mask [B, HW])."""
        b, h, w, _ = x.shape
        x = self.input_norm(self.input_proj(x)).astype(self.dtype)
        if x_mask is None:
            x_mask = jnp.zeros((b, h, w), bool)
        pos = sine_position_embedding_2d(
            jnp.asarray(x_mask, bool), self.d_model // 2,
            normalize=True).astype(self.dtype)
        x = x.reshape(b, h * w, self.d_model)
        pos = pos.reshape(b, h * w, self.d_model)
        mask = x_mask.reshape(b, h * w)
        for layer in self.encoder_layers:
            x = layer(x, pos, mask, deterministic)
        return x, pos, mask

    def forward_decoder(self, seq_ids, memory, memory_pos, memory_mask,
                        deterministic=True):
        """seq_ids [B, L] coordinate tokens -> logits [B, L, vocab]."""
        if seq_ids.shape[1] > self.max_seq_len:
            # XLA clamps out-of-bounds gathers, which would silently
            # duplicate the last position embedding instead of failing
            raise ValueError(
                f"sequence length {seq_ids.shape[1]} exceeds "
                f"max_seq_len={self.max_seq_len}; for generate(), use "
                f"steps <= max_seq_len - 1")
        emb = self.query_embedding(seq_ids)
        qpos = self.seq_pos(jnp.arange(seq_ids.shape[1]))
        mask = causal_mask(seq_ids.shape[1])
        x = emb
        for layer in self.decoder_layers:
            x = layer(x, memory, query_pos=qpos, memory_pos=memory_pos,
                      memory_key_padding_mask=memory_mask,
                      tgt_mask=mask, deterministic=deterministic)
        x = self.decoder_norm(x).astype(self.dtype)
        return self.predictor(x)

    def __call__(self, x, seq_ids, x_mask=None, deterministic=True):
        memory, pos, mask = self.forward_encoder(x, x_mask,
                                                 deterministic)
        return self.forward_decoder(seq_ids, memory, pos, mask,
                                    deterministic)

    @staticmethod
    def generate(model, params, x, start_id: int, steps: int):
        """Fixed-length greedy decode (teacher-forcing re-run per step;
        static shapes under jit)."""
        b = x.shape[0]
        ids = jnp.full((b, steps + 1), start_id, jnp.int32)
        step = jax.jit(lambda p, xx, ii: model.apply(p, xx, ii))
        for t in range(steps):
            logits = step(params, x, ids)
            nxt = jnp.argmax(logits[:, t, :], axis=-1).astype(jnp.int32)
            ids = ids.at[:, t + 1].set(nxt)
        return ids[:, 1:]


class MDETRTransformer(nn.Module):
    """MDETR encoder/decoder (core/layers/mdetr_transformer.py:24-159):
    encoder memory = concat(image tokens, resized text features);
    decoder = learned object queries cross-attending the joint memory
    (non-causal, DETR-style)."""

    d_model: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_queries: int = 100
    text_dim: int = 768
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, text_feat, text_mask,
                 deterministic=True):
        """x [B,H,W,C] image features; text_feat [B,T,text_dim];
        masks True = padded.  Returns stacked decoder intermediates
        [L, B, num_queries, D]."""
        b, h, w, _ = x.shape
        x = nn.Dense(self.d_model, dtype=self.dtype,
                     param_dtype=jnp.float32, name="input_proj")(x)
        pos = sine_position_embedding_2d(
            jnp.asarray(x_mask, bool), self.d_model // 2,
            normalize=True).astype(self.dtype)
        src = x.reshape(b, h * w, self.d_model)
        pos = pos.reshape(b, h * w, self.d_model)
        txt = FeatureResizer(self.d_model, self.dropout, self.dtype,
                             name="resizer")(text_feat, deterministic)
        src = jnp.concatenate([src, txt], axis=1)
        # zero positions for text tokens (mdetr_transformer.py:141-143)
        pos = jnp.concatenate([pos, jnp.zeros_like(txt)], axis=1)
        mask = jnp.concatenate(
            [x_mask.reshape(b, h * w), text_mask.astype(bool)], axis=1)

        for i in range(self.num_encoder_layers):
            src = EncoderLayer1D(self.d_model, self.num_heads,
                                 self.ffn_dim, self.dropout,
                                 self.dtype, name=f"enc_{i}")(
                src, pos, mask, deterministic)

        queries = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.d_model), jnp.float32)
        tgt = jnp.zeros((b, self.num_queries, self.d_model), self.dtype)
        qpos = jnp.broadcast_to(
            queries.astype(self.dtype),
            (b, self.num_queries, self.d_model))
        inter = []
        for i in range(self.num_decoder_layers):
            tgt = DecoderLayer1D(self.d_model, self.num_heads,
                                 self.ffn_dim, self.dropout,
                                 self.dtype, name=f"dec_{i}")(
                tgt, src, query_pos=qpos, memory_pos=pos,
                memory_key_padding_mask=mask, tgt_mask=None,
                deterministic=deterministic)
            inter.append(tgt)
        norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=jnp.float32, name="dec_norm")
        return jnp.stack([norm(t).astype(self.dtype) for t in inter])
