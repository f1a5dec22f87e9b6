import math

import jax.numpy as jnp
import numpy as np

from simvg_tpu.ops import sine_position_embedding_1d_ref, sine_position_embedding_2d


def test_sine_1d_ref_quirk():
    """The reference 1-D embedding collapses to [sin(p), cos(p), 0, 1, ...]
    because of its int64 frequency cast (simvg/models/heads/utils.py:89)."""
    emb = np.asarray(sine_position_embedding_1d_ref(20, 256))
    pos = np.arange(20)
    np.testing.assert_allclose(emb[:, 0], np.sin(pos), atol=1e-6)
    np.testing.assert_allclose(emb[:, 1], np.cos(pos), atol=1e-6)
    np.testing.assert_allclose(emb[:, 2::2], 0.0, atol=1e-6)
    np.testing.assert_allclose(emb[:, 3::2], 1.0, atol=1e-6)


def _numpy_detr_sine(mask, num_pos_feats, temperature=10000.0):
    """Independent numpy re-derivation of the DETR sine embedding."""
    not_mask = (~mask).astype(np.float64)
    y = not_mask.cumsum(1)
    x = not_mask.cumsum(2)
    scale = 2 * math.pi
    y = y / (y[:, -1:, :] + 1e-6) * scale
    x = x / (x[:, :, -1:] + 1e-6) * scale
    dim_t = temperature ** (
        2 * (np.arange(num_pos_feats) // 2) / num_pos_feats
    )
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    out_x = np.empty_like(px)
    out_x[..., 0::2] = np.sin(px[..., 0::2])
    out_x[..., 1::2] = np.cos(px[..., 1::2])
    out_y = np.empty_like(py)
    out_y[..., 0::2] = np.sin(py[..., 0::2])
    out_y[..., 1::2] = np.cos(py[..., 1::2])
    return np.concatenate([out_y, out_x], axis=-1)


def test_sine_2d_matches_detr_formula():
    mask = np.zeros((2, 7, 9), bool)
    mask[1, 5:, :] = True  # sample 1 padded below row 5
    mask[1, :, 6:] = True
    ours = np.asarray(sine_position_embedding_2d(jnp.asarray(mask), 128))
    ref = _numpy_detr_sine(mask, 128)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    assert ours.shape == (2, 7, 9, 256)
