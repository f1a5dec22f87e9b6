"""Fused multi-head attention Pallas kernel for TPU.

The hottest op in the stack: BEiT-3 self-attention over the joint
[CLS]+patches+text sequence (SURVEY.md "hot loops": ~95% of FLOPs,
12-24 layers x 421-1621 tokens).  Design:

- grid (B, H, Sq/block_q): each program computes one query block of one
  head, with the head's FULL K/V resident in VMEM (S <= ~2k tokens and
  head_dim 64 -> K is <1 MB: far under the 16 MB VMEM budget, so no
  online-softmax streaming is needed; one-shot softmax per query block
  keeps the kernel simple and the MXU busy).
- logits and softmax in float32 (parity with torchscale's fp32 softmax,
  beit3_base.py attention), output cast back to the input dtype.
- key-padding mask (1 = padded, the reference convention) plus the
  block-padding mask folded into one additive bias.

Sequence/query lengths are padded to block multiples outside the kernel
(static shapes; padding keys are masked, padding query rows are sliced
off afterwards).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    # q [1, block_q, hd]; k/v [1, Sk, hd]; bias [1, 1, Sk] additive (f32)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits + bias_ref[0]  # [1, Sk] broadcasts over block_q
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    probs = (e / s).astype(v.dtype)
    out = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "interpret"),
)
def fused_attention(
    q: jnp.ndarray,  # [B, Sq, H, hd], ALREADY scaled by hd**-0.5
    k: jnp.ndarray,  # [B, Sk, H, hd]
    v: jnp.ndarray,  # [B, Sk, H, hd]
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, Sk], 1 = pad
    attn_bias: Optional[jnp.ndarray] = None,  # broadcastable [B,H,Sq,Sk]
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, Sq, H, hd] in q.dtype."""
    b, sq, h, hd = q.shape
    sk = k.shape[1]
    if attn_bias is not None:
        # rare path (not used by the shipped configs): fall back to XLA
        # rather than materialising a 4D bias block spec.
        raise NotImplementedError("attn_bias not supported in the kernel")

    # pad sequence dims to tile multiples
    sq_p = -(-sq // block_q) * block_q
    sk_p = -(-sk // 128) * 128
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))

    if key_padding_mask is None:
        pad = jnp.zeros((b, sk), bool)
    else:
        pad = key_padding_mask.astype(bool)
    pad = jnp.pad(pad, ((0, 0), (0, sk_p - sk)), constant_values=True)
    # [B, 1, Sk_p]: 3-D so the (1, sk_p) block satisfies the TPU
    # last-two-dims tiling constraint (dims equal to the array's).
    bias = jnp.where(pad, _NEG, 0.0).astype(jnp.float32)[:, None, :]

    # [B, S, H, hd] -> [B*H, S, hd]: TPU block specs need the last two
    # dims tile-aligned, so heads move into the grid axis.
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq_p, hd)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk_p, hd)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk_p, hd)

    grid = (b * h, sq_p // block_q)
    out = pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, sk_p, hd), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, sk_p, hd), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, 1, sk_p), lambda bh, qi: (bh // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd),
                               lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, hd), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * sk_p * hd,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * sq_p * sk_p,
        ),
    )(qf, kf, vf, bias)
    out = out.reshape(b, h, sq_p, hd).transpose(0, 2, 1, 3)
    return out[:, :sq]
