"""Pallas fused attention vs the XLA reference path (interpret mode on
CPU; the same kernel compiles for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.ops.attention import multihead_attention
from simvg_tpu.ops.pallas_attention import fused_attention


def _mk(b, s, h, hd, seed=0):
    r = np.random.default_rng(seed)
    q = r.normal(size=(b, s, h * hd)).astype(np.float32)
    k = r.normal(size=(b, s, h * hd)).astype(np.float32)
    v = r.normal(size=(b, s, h * hd)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_fused_matches_xla_with_padding():
    b, s, h, hd = 2, 37, 4, 64
    q, k, v = _mk(b, s, h, hd)
    pad = np.zeros((b, s), np.int32)
    pad[0, 30:] = 1
    pad[1, 10:] = 1
    pad = jnp.asarray(pad)

    ref = multihead_attention(q, k, v, num_heads=h, key_padding_mask=pad)

    scale = hd ** -0.5
    qh = (q * scale).reshape(b, s, h, hd)
    kh = k.reshape(b, s, h, hd)
    vh = v.reshape(b, s, h, hd)
    out = fused_attention(qh, kh, vh, key_padding_mask=pad,
                          block_q=16, interpret=True)
    out = out.reshape(b, s, h * hd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_fused_no_mask_odd_lengths():
    b, s, h, hd = 1, 421, 2, 32  # the base/32@640 sequence length
    q, k, v = _mk(b, s, h, hd, seed=1)
    ref = multihead_attention(q, k, v, num_heads=h)
    scale = hd ** -0.5
    out = fused_attention(
        (q * scale).reshape(b, s, h, hd),
        k.reshape(b, s, h, hd),
        v.reshape(b, s, h, hd),
        block_q=128,
        interpret=True,
    ).reshape(b, s, h * hd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_multihead_attention_pallas_impl_flag():
    """The impl="pallas" route through ops.attention (used by the
    encoder when enabled)."""
    b, s, h, hd = 2, 50, 4, 16
    q, k, v = _mk(b, s, h, hd, seed=2)
    pad = jnp.zeros((b, s), jnp.int32).at[:, 40:].set(1)
    ref = multihead_attention(q, k, v, num_heads=h, key_padding_mask=pad,
                              impl="xla")
    import simvg_tpu.ops.pallas_attention as pa

    orig = pa.fused_attention

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    pa.fused_attention = interp
    try:
        out = multihead_attention(q, k, v, num_heads=h,
                                  key_padding_mask=pad, impl="pallas")
    finally:
        pa.fused_attention = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_fused_attention_gradients_match_xla():
    """Custom-VJP backward kernel vs autodiff through the XLA path."""
    b, s, h, hd = 2, 45, 4, 32
    q, k, v = _mk(b, s, h, hd, seed=5)
    pad = jnp.zeros((b, s), jnp.int32).at[:, 40:].set(1)
    scale = hd ** -0.5
    cot = jnp.asarray(
        np.random.default_rng(6).normal(size=(b, s, h, hd)), jnp.float32
    )

    def loss_pallas(q, k, v):
        out = fused_attention(
            (q * scale).reshape(b, s, h, hd), k.reshape(b, s, h, hd),
            v.reshape(b, s, h, hd), key_padding_mask=pad, block_q=16,
            interpret=True,
        )
        return (out * cot).sum()

    def loss_xla(q, k, v):
        out = multihead_attention(q, k, v, num_heads=h,
                                  key_padding_mask=pad)
        return (out.reshape(b, s, h, hd) * cot).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-4, rtol=1e-3)
