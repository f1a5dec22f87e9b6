"""scan_layers=True must be numerically identical to the unrolled
encoder given stacked parameters, and differentiable."""

import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder
from tools.convert_checkpoint import (
    stack_scan_layers,
    unstack_scan_layers,
)


def _deep(d):
    return {k: _deep(v) for k, v in d.items()} if isinstance(
        d, dict) else np.asarray(d)


def test_scan_matches_unrolled():
    kw = dict(img_size=32, patch_size=16, embed_dim=32, num_heads=4,
              ffn_dim=64, num_layers=3, vocab_size=60,
              drop_path_rate=0.0)
    enc_u = BEiT3Encoder(BEiT3Config(**kw))
    enc_s = BEiT3Encoder(BEiT3Config(**kw, scan_layers=True))

    r = np.random.default_rng(0)
    img = jnp.asarray(r.normal(size=(2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(r.integers(1, 60, (2, 5)), jnp.int32)
    pad = jnp.zeros((2, 5), jnp.int32).at[:, 4:].set(1)

    p_u = _deep(enc_u.init(jax.random.PRNGKey(0), img, ids, pad))
    p_s = stack_scan_layers(p_u)

    iu, tu, cu = enc_u.apply(p_u, img, ids, pad)
    is_, ts, cs = enc_s.apply(p_s, img, ids, pad)
    np.testing.assert_allclose(np.asarray(iu), np.asarray(is_),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tu), np.asarray(ts), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cu), np.asarray(cs), atol=1e-5)

    # roundtrip unstack
    back = unstack_scan_layers(p_s)
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(p_u)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        assert ka == kb
        np.testing.assert_allclose(va, vb)

    # grad flows through scan (+remat)
    enc_r = BEiT3Encoder(BEiT3Config(**kw, scan_layers=True, remat=True))

    def loss(p):
        i, t, c = enc_r.apply(p, img, ids, pad)
        return (i ** 2).sum()

    g = jax.jit(jax.grad(loss))(p_s)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(g))


def test_converter_handles_scanned_target():
    """Converting a torch state dict into a scan-layout model must equal
    converting into the unrolled model and then stacking."""
    from test_checkpoint_convert import TorchBeit3, _export_torch_keys
    from tools.convert_checkpoint import convert_beit3_encoder

    import torch

    torch.manual_seed(1)
    tm = TorchBeit3()
    sd = _export_torch_keys(tm)

    kw = dict(img_size=32, patch_size=16, embed_dim=32, num_heads=4,
              ffn_dim=64, num_layers=2, vocab_size=60,
              max_source_positions=64, drop_path_rate=0.0)
    enc_u = BEiT3Encoder(BEiT3Config(**kw))
    img = jnp.ones((1, 32, 32, 3))
    ids = jnp.ones((1, 4), jnp.int32)
    pad = jnp.zeros((1, 4), jnp.int32)
    p_u = _deep(enc_u.init(jax.random.PRNGKey(0), img, ids, pad))
    convert_beit3_encoder(sd, p_u, prefix="beit3.", out_prefix="")
    p_stacked_ref = stack_scan_layers(p_u)

    enc_s = BEiT3Encoder(BEiT3Config(**kw, scan_layers=True))
    i1, t1, c1 = enc_s.apply(p_stacked_ref, img, ids, pad)
    i2, t2, c2 = enc_u.apply(p_u, img, ids, pad)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-5)
