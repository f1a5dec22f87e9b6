"""Legacy language encoders (GRU/LSTM over word embeddings).

Functional equivalent of the reference's lan_enc family
(simvg/models/lan_encs/lstm.py:6-78): a (bi)GRU over frozen-or-trainable
word embeddings with mean/max/default/original pooling.  SimVG's shipped
configs set ``lan_enc=None`` (BEiT-3 encodes text jointly), but the
component remains available for SeqTR-style compositions.

The recurrence is a ``lax.scan`` over the token axis — sequential by
nature, but max_token <= 64 keeps it off the critical path; all gate
math is batched matmuls on the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


class GRU(nn.Module):
    hidden_size: int
    reverse: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        dd = dict(dtype=self.dtype, param_dtype=jnp.float32)
        # input projections for ALL timesteps at once (one big matmul
        # on the MXU); only the recurrence stays sequential
        gi_all = nn.Dense(3 * self.hidden_size, name="ih", **dd)(x)
        w_hh = self.param(
            "hh_kernel", nn.initializers.lecun_normal(),
            (self.hidden_size, 3 * self.hidden_size), jnp.float32,
        ).astype(self.dtype)
        b_hh = self.param(
            "hh_bias", nn.initializers.zeros, (3 * self.hidden_size,),
            jnp.float32,
        ).astype(self.dtype)

        def step(h, gi):
            gh = h @ w_hh + b_hh
            i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            h_new = (1 - z) * n + z * h
            return h_new, h_new

        gis = jnp.swapaxes(gi_all, 0, 1)  # [T, B, 3H]
        if self.reverse:
            gis = gis[::-1]
        h0 = jnp.zeros((x.shape[0], self.hidden_size), self.dtype)
        _, ys = jax.lax.scan(step, h0, gis)
        if self.reverse:
            ys = ys[::-1]
        return jnp.swapaxes(ys, 0, 1)


class BERTLanguageEncoder(nn.Module):
    """"ALBERTA"-style HF transformer language encoder
    (simvg/models/lan_encs/bert.py wraps HF ``AutoModel`` roberta-base).

    The layout is the HF BERT/roberta POST-LN architecture exactly
    (residual add *then* LayerNorm, eps 1e-12, exact GELU), so released
    HF checkpoints convert weight-for-weight
    (tools/convert_checkpoint.py ``convert_hf_bert``):

    - embeddings: word + position(arange + position_offset) -> LN.
      roberta's token_type row 0 (added uniformly to every position by
      HF) is folded into the position table by the converter.
    - position_offset: roberta numbers positions from padding_idx+1 = 2
      for pad-at-end sequences (create_position_ids_from_input_ids);
      BERT uses 0.

    COMPATIBILITY: round 3 re-architected this module pre-LN -> post-LN
    (with renamed params: ln1_/ln2_ -> attn_ln_/ffn_ln_, embeddings_ln
    after the sum) to match HF semantics.  A checkpoint saved with a
    bert-type lan_enc before that change fails orbax restore with a
    structure mismatch on lan_enc/ln1_*: those weights were trained
    under different (pre-LN) semantics and cannot be mapped — retrain
    or convert from the HF original.
    """

    vocab_size: int = 30522
    hidden_size: int = 256
    num_layers: int = 3
    num_heads: int = 8
    max_positions: int = 512
    position_offset: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray, padding_mask=None):
        from simvg_tpu.ops.attention import multihead_attention

        dd = dict(dtype=self.dtype, param_dtype=jnp.float32)
        ln = dict(epsilon=1e-12, dtype=jnp.float32)
        if padding_mask is None:
            padding_mask = (ids == 0).astype(jnp.int32)
        x = nn.Embed(self.vocab_size, self.hidden_size,
                     param_dtype=jnp.float32, dtype=self.dtype,
                     name="word_embeddings")(ids)
        pos = nn.Embed(self.max_positions, self.hidden_size,
                       param_dtype=jnp.float32, dtype=self.dtype,
                       name="position_embeddings")(
            jnp.arange(ids.shape[1]) + self.position_offset)
        x = nn.LayerNorm(name="embeddings_ln", **ln)(
            x + pos).astype(self.dtype)
        for i in range(self.num_layers):
            q = nn.Dense(self.hidden_size, name=f"q_{i}", **dd)(x)
            k = nn.Dense(self.hidden_size, name=f"k_{i}", **dd)(x)
            v = nn.Dense(self.hidden_size, name=f"v_{i}", **dd)(x)
            a = multihead_attention(q, k, v, num_heads=self.num_heads,
                                    key_padding_mask=padding_mask,
                                    dtype=self.dtype)
            h = nn.Dense(self.hidden_size, name=f"o_{i}", **dd)(a)
            x = nn.LayerNorm(name=f"attn_ln_{i}", **ln)(
                x + h).astype(self.dtype)
            h = nn.Dense(4 * self.hidden_size, name=f"fc1_{i}", **dd)(x)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.hidden_size, name=f"fc2_{i}", **dd)(h)
            x = nn.LayerNorm(name=f"ffn_ln_{i}", **ln)(
                x + h).astype(self.dtype)
        return {"text_feat": x, "text_mask": padding_mask.astype(bool)}


class PhraseAttention(nn.Module):
    """rnn.PhraseAttention (simvg/models/lan_encs/rnn.py:97-118):
    softmax attention over word positions, re-normalised after zeroing
    padding, returning the weighted word embedding."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, context, embedded, input_labels):
        scores = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                          name="fc")(context)[..., 0]
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        not_pad = (input_labels != 0).astype(attn.dtype)
        attn = attn * not_pad
        attn = attn / jnp.maximum(attn.sum(axis=1, keepdims=True), 1e-12)
        weighted = jnp.einsum("bt,btc->bc", attn.astype(embedded.dtype),
                              embedded)
        return attn, weighted


class LSTMLanguageEncoder(nn.Module):
    """lan_encs.LSTM equivalent.

    Note the reference's class NAMED "LSTM" asserts ``lstm_cfg.type in
    ["gru"]`` and builds ``nn.GRU`` (simvg/models/lan_encs/lstm.py:29-30)
    — GRU IS the reference cell; this module matches it. All five output
    modes are supported, incl. "query" (4 PhraseAttention parsers +
    projection, lstm.py:35-38,68-71)."""

    vocab_size: int
    word_emb_dim: int = 300
    hidden_size: int = 512
    bidirectional: bool = True
    output_type: str = "max"  # mean | max | default | original | query
    word_emb: Optional[jnp.ndarray] = None  # pretrained [V, C] (GloVe)
    freeze_emb: bool = True  # lstm.py:24-27 (from_pretrained freeze)
    out_dim: int = 256  # "query" projection width
    num_query_parsers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ref_expr_inds: jnp.ndarray):
        y_mask = jnp.abs(ref_expr_inds) == 0  # True = padding

        if self.word_emb is not None:
            emb_init = lambda *_: jnp.asarray(self.word_emb, jnp.float32)
        else:
            emb_init = nn.initializers.normal(0.02)
        embed = nn.Embed(self.vocab_size, self.word_emb_dim,
                         embedding_init=emb_init, dtype=self.dtype,
                         param_dtype=jnp.float32, name="embedding")
        y_word = embed(ref_expr_inds)
        if self.freeze_emb:
            y_word = jax.lax.stop_gradient(y_word)

        fwd = GRU(self.hidden_size, dtype=self.dtype, name="gru_fwd")(
            y_word)
        if self.bidirectional:
            bwd = GRU(self.hidden_size, reverse=True, dtype=self.dtype,
                      name="gru_bwd")(y_word)
            y_word = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            y_word = fwd

        valid = (~y_mask)[..., None]
        if self.output_type == "mean":
            y = (y_word * valid).sum(1) / jnp.maximum(valid.sum(1), 1)
            y = y[:, None]
        elif self.output_type == "max":
            neg = jnp.asarray(-1e30, y_word.dtype)
            y = jnp.where(valid, y_word, neg).max(axis=1)[:, None]
        elif self.output_type == "default":
            # the FINAL hidden state per direction (torch nn.GRU's h),
            # i.e. last step of the forward scan and first position of
            # the (un-reversed) backward scan, flattened (lstm.py:66-68)
            h_fwd = fwd[:, -1]
            if self.bidirectional:
                h_bwd = bwd[:, 0]
                y = jnp.concatenate([h_fwd, h_bwd], axis=-1)[:, None]
            else:
                y = h_fwd[:, None]
        elif self.output_type == "query":
            parsed = [
                PhraseAttention(dtype=self.dtype, name=f"parser_{i}")(
                    y_word, y_word, ref_expr_inds)[1]
                for i in range(self.num_query_parsers)
            ]
            y = jnp.stack(parsed, axis=1)
            y = nn.Dense(self.out_dim, dtype=self.dtype,
                         param_dtype=jnp.float32, name="linear")(y)
        elif self.output_type == "original":
            return {"text_feat": y_word, "text_mask": y_mask}
        else:
            raise ValueError(self.output_type)
        return y
