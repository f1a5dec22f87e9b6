"""int8 serving path (ops/quant.py + BEiT3Config.quant)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from simvg_tpu.ops.quant import Int8Dense, quantize_symmetric


def test_quantize_symmetric_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.05, (64, 32)).astype(np.float32)
    q, s = quantize_symmetric(jnp.asarray(w), axis=0)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    # max error is half a quantization step per channel
    step = np.asarray(s)
    assert (np.abs(deq - w) <= 0.5 * step + 1e-7).all()


def test_int8_dense_matches_dense_layout_and_value():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1.0, (4, 10, 64)).astype(np.float32)
    d = nn.Dense(32, dtype=jnp.float32, param_dtype=jnp.float32)
    q = Int8Dense(32, dtype=jnp.float32)
    pd = d.init(jax.random.PRNGKey(0), jnp.asarray(x))
    pq = q.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # identical parameter layout: converted checkpoints load unchanged
    assert jax.tree_util.tree_structure(pd) == \
        jax.tree_util.tree_structure(pq)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree.leaves(pd), jax.tree.leaves(pq)))

    ref = np.asarray(d.apply(pd, jnp.asarray(x)))
    ours = np.asarray(q.apply(pd, jnp.asarray(x)))  # same f32 params
    denom = np.abs(ref).mean() + 1e-6
    rel = np.abs(ours - ref).mean() / denom
    assert rel < 0.02, rel  # w8a8 dynamic quant noise, not garbage
    assert not np.allclose(ours, ref)  # actually quantized


def test_beit3_int8_config_runs_and_tracks_fp():
    from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder

    kw = dict(img_size=32, patch_size=16, embed_dim=32, num_heads=4,
              ffn_dim=64, num_layers=2, vocab_size=60,
              drop_path_rate=0.0, dtype=jnp.float32)
    enc_fp = BEiT3Encoder(BEiT3Config(**kw))
    enc_q = BEiT3Encoder(BEiT3Config(quant="int8", **kw))
    rng = np.random.default_rng(2)
    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(0, 60, (2, 6)).astype(np.int32)
    pad = np.zeros((2, 6), np.int32)

    params = enc_fp.init(jax.random.PRNGKey(0), jnp.asarray(img),
                         jnp.asarray(ids), jnp.asarray(pad))
    # same param tree drives both impls
    fi, ft, fc = enc_fp.apply(params, jnp.asarray(img), jnp.asarray(ids),
                              jnp.asarray(pad))
    qi, qt, qc = enc_q.apply(params, jnp.asarray(img), jnp.asarray(ids),
                             jnp.asarray(pad))
    for a, b in ((qi, fi), (qt, ft), (qc, fc)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.abs(a - b).mean() / (np.abs(b).mean() + 1e-6)
        assert rel < 0.15, rel  # 2-layer random net: quant noise bounded
        assert np.isfinite(a).all()


def test_beit3_int8_composes_with_scan_layers():
    """int8 serving must work in the shipped scan layout (stacked
    [L, ...] Int8Dense kernels)."""
    from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder

    kw = dict(img_size=32, patch_size=16, embed_dim=32, num_heads=4,
              ffn_dim=64, num_layers=2, vocab_size=60,
              drop_path_rate=0.0, dtype=jnp.float32, scan_layers=True)
    enc = BEiT3Encoder(BEiT3Config(quant="int8", **kw))
    rng = np.random.default_rng(3)
    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(0, 60, (2, 6)).astype(np.int32)
    pad = np.zeros((2, 6), np.int32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(img),
                      jnp.asarray(ids), jnp.asarray(pad))
    qi, qt, qc = jax.jit(
        lambda p: enc.apply(p, jnp.asarray(img), jnp.asarray(ids),
                            jnp.asarray(pad)))(params)
    for a in (qi, qt, qc):
        assert np.isfinite(np.asarray(a, np.float32)).all()
