"""Multi-head attention core.

Semantics mirror torchscale's MultiheadAttention math (used by the BEiT-3
encoder, simvg/models/vis_encs/beit/beit3_base.py:137-145) and torch
``nn.MultiheadAttention`` (used by the detrex DETR layers,
simvg/models/heads/tgqs_kd_detr_head/transformer.py:36-41):

    q <- q * head_dim**-0.5
    logits <- q @ k^T  (+ additive bias)  (padded keys -> -inf)
    probs  <- softmax(logits) computed in float32
    out    <- probs @ v

The default implementation is pure jnp and relies on XLA fusion; a Pallas
fused kernel (``simvg_tpu.ops.pallas_attention``) can be swapped in via
``impl="pallas"`` once the sequence is long enough to pay off.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,
    attn_bias: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    dtype: Any = jnp.float32,
    impl: str = "xla",
    return_weights: bool = False,
) -> jnp.ndarray:
    """Batched multi-head attention.

    Args:
        q/k/v: [B, S_q, D] / [B, S_k, D] / [B, S_k, D], already projected.
        num_heads: head count (D % num_heads == 0).
        key_padding_mask: optional bool/int [B, S_k]; nonzero = PADDED key
            (reference convention: 1 = pad, loading.py:175).
        attn_bias: optional additive bias broadcastable to
            [B, H, S_q, S_k].
        dropout_rate: attention-prob dropout (applied post-softmax).
        dtype: compute dtype of the matmuls (softmax is always fp32).

    Returns:
        [B, S_q, D] in `dtype`.
    """
    b, s_q, d = q.shape
    s_k = k.shape[1]
    assert d % num_heads == 0, (d, num_heads)
    head_dim = d // num_heads
    scale = head_dim ** -0.5

    q = (q * scale).reshape(b, s_q, num_heads, head_dim).astype(dtype)
    k = k.reshape(b, s_k, num_heads, head_dim).astype(dtype)
    v = v.reshape(b, s_k, num_heads, head_dim).astype(dtype)

    if impl == "pallas" and not return_weights:
        # The fused kernel handles none of: non-TPU backends (Mosaic
        # lowering), additive attn_bias, or post-softmax dropout — fall
        # back to the XLA path for any of those instead of crashing or
        # silently skipping dropout.
        kernel_ok = (
            jax.default_backend() == "tpu"
            and attn_bias is None
            and (deterministic or dropout_rate == 0.0)
        )
        if kernel_ok:
            from simvg_tpu.ops.pallas_attention import fused_attention

            out = fused_attention(q, k, v,
                                  key_padding_mask=key_padding_mask)
            return out.reshape(b, s_q, d).astype(dtype)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if attn_bias is not None:
        logits = logits + attn_bias.astype(jnp.float32)
    if key_padding_mask is not None:
        pad = key_padding_mask.astype(bool)[:, None, None, :]
        logits = jnp.where(pad, _NEG_INF, logits)

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    if dropout_rate > 0.0 and not deterministic:
        assert dropout_rng is not None
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    probs = probs.astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32)
    out = out.reshape(b, s_q, d).astype(dtype)
    if return_weights:
        return out, probs  # [B, H, S_q, S_k]
    return out
