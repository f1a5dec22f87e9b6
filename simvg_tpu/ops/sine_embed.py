"""Sinusoidal position embeddings.

Two variants, both matching the reference head exactly:

- ``sine_position_embedding_2d``: the DETR 2-D sine embedding over the
  image feature grid (detrex ``PositionEmbeddingSine`` with
  ``num_pos_feats=embed_dim//2, temperature=10000, normalize=True``,
  instantiated at simvg/models/heads/tgqs_kd_detr_head/
  tgqs_kd_detr_head.py:90-94 and consumed via ``x_mask_pos_enc``
  ibid.:322-338).

- ``sine_position_embedding_1d_ref``: the reference's
  ``PositionEmbeddingSine1D`` (simvg/models/heads/utils.py:48-100).  NOTE:
  the reference implementation casts its inverse-frequency vector to int64
  (utils.py:89), which floors every frequency except the first to zero.
  The resulting embedding is therefore [sin(p), cos(p), 0, 1, 0, 1, ...].
  We reproduce that behaviour bit-for-bit because released checkpoints were
  trained against it; the "intended" smooth embedding would not be
  weight-compatible.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sine_position_embedding_2d(
    pad_mask: jnp.ndarray,
    num_pos_feats: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """2-D sine embedding from a padding mask.

    Args:
        pad_mask: bool [B, H, W]; True marks PADDED pixels (same convention
            as the reference's ``x_mask``).
        num_pos_feats: features per axis; output dim is ``2*num_pos_feats``.

    Returns:
        [B, H, W, 2*num_pos_feats] float32 (y-features first, then x,
        matching torch's ``cat([pos_y, pos_x], dim=3)``).
    """
    not_mask = (~pad_mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(i / 2.0) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    # Interleave sin on even channels, cos on odd (torch: stack+flatten).
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(*x_embed.shape, num_pos_feats)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(*y_embed.shape, num_pos_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def sine_position_embedding_1d_ref(seq_len: int, dim: int) -> jnp.ndarray:
    """Reference-faithful 1-D "sine" embedding for text positions.

    Returns [seq_len, dim] float32.  See module docstring: because the
    reference floors its frequency vector to integers
    (simvg/models/heads/utils.py:85-89), only frequency index 0 survives
    (value 1); all other frequencies are 0.  So:
        out[:, 0] = sin(pos), out[:, 1] = cos(pos),
        out[:, 2::2] = 0,      out[:, 3::2] = 1.
    """
    assert dim % 2 == 0, "wrong dimension!"
    pos = jnp.arange(seq_len, dtype=jnp.float32)
    half = dim // 2
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(half, dtype=jnp.float32) / half))
    inv_freq = jnp.floor(inv_freq)  # the reference's int64 cast
    out = pos[:, None] * inv_freq[None, :]
    emb = jnp.zeros((seq_len, dim), jnp.float32)
    emb = emb.at[:, 0::2].set(jnp.sin(out))
    emb = emb.at[:, 1::2].set(jnp.cos(out))
    return emb
