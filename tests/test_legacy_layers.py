"""SeqTR/MDETR legacy transformers + mdetr matcher
(reference core/layers/* and core/matcher.py inventory parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.models.legacy_layers import (
    AutoRegressiveTransformer,
    MDETRTransformer,
    causal_mask,
)


def test_causal_mask():
    m = np.asarray(causal_mask(4))
    assert (np.tril(m) == 0).all()
    assert np.isinf(m[0, 1]) and np.isinf(m[2, 3])


def test_autoregressive_transformer_causality_and_generate():
    model = AutoRegressiveTransformer(
        d_model=32, num_heads=4, ffn_dim=64, num_encoder_layers=1,
        num_decoder_layers=1, vocab_size=20, max_seq_len=5,
        dropout=0.0)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(2, 4, 4, 16)), jnp.float32)
    seq = jnp.asarray(r.integers(0, 20, (2, 5)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, seq)
    logits = model.apply(params, x, seq)
    assert logits.shape == (2, 5, 20)

    # causality: perturbing a later token leaves earlier logits alone
    seq2 = seq.at[:, 3].set((seq[:, 3] + 5) % 20)
    logits2 = model.apply(params, x, seq2)
    np.testing.assert_allclose(np.asarray(logits[:, :3]),
                               np.asarray(logits2[:, :3]), atol=1e-5)
    assert not np.allclose(np.asarray(logits[:, 3:]),
                           np.asarray(logits2[:, 3:]), atol=1e-5)

    ids = AutoRegressiveTransformer.generate(model, params, x,
                                             start_id=0, steps=4)
    assert np.asarray(ids).shape == (2, 4)
    assert ((np.asarray(ids) >= 0) & (np.asarray(ids) < 20)).all()


def test_autoregressive_padding_mask_plumbed():
    """The x_mask must reach attention as a key-padding mask.  (Full
    content-invariance is impossible by design: the reference's
    input_proj GroupNorm also normalises over padded pixels,
    transformer.py:354-356 ConvModule GN.)  Verify at the encoder
    level: with the input projection bypassed, padded-key content must
    not change the memory at unpadded positions."""
    from simvg_tpu.models.legacy_layers import EncoderLayer1D

    r = np.random.default_rng(1)
    layer = EncoderLayer1D(32, 4, 64, dropout=0.0)
    x = jnp.asarray(r.normal(size=(1, 8, 32)), jnp.float32)
    pos = jnp.asarray(r.normal(size=(1, 8, 32)), jnp.float32)
    mask = jnp.zeros((1, 8), bool).at[:, 5:].set(True)
    params = layer.init(jax.random.PRNGKey(0), x, pos, mask)
    out1 = layer.apply(params, x, pos, mask)
    x2 = x.at[:, 5:, :].set(99.0)
    out2 = layer.apply(params, x2, pos, mask)
    np.testing.assert_allclose(np.asarray(out1[:, :5]),
                               np.asarray(out2[:, :5]), atol=1e-5)


def test_mdetr_transformer_shapes():
    model = MDETRTransformer(d_model=32, num_heads=4, ffn_dim=64,
                             num_encoder_layers=1, num_decoder_layers=2,
                             num_queries=5, text_dim=24, dropout=0.0)
    r = np.random.default_rng(2)
    x = jnp.asarray(r.normal(size=(2, 4, 4, 16)), jnp.float32)
    xm = jnp.zeros((2, 4, 4), bool)
    txt = jnp.asarray(r.normal(size=(2, 6, 24)), jnp.float32)
    tm = jnp.zeros((2, 6), jnp.int32).at[:, 4:].set(1)
    params = model.init(jax.random.PRNGKey(0), x, xm, txt, tm)
    out = model.apply(params, x, xm, txt, tm)
    assert out.shape == (2, 2, 5, 32)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_mdetr_matcher_vs_scipy_oracle():
    from scipy.optimize import linear_sum_assignment

    from simvg_tpu.losses.legacy import mdetr_hungarian_match

    r = np.random.default_rng(3)
    b, q, t, v = 3, 6, 4, 10
    logits = r.normal(size=(b, q, v)).astype(np.float32)
    boxes = np.stack([
        r.uniform(0.3, 0.7, (b, q)), r.uniform(0.3, 0.7, (b, q)),
        r.uniform(0.05, 0.3, (b, q)), r.uniform(0.05, 0.3, (b, q)),
    ], -1).astype(np.float32)
    tboxes = np.stack([
        r.uniform(0.3, 0.7, (b, t)), r.uniform(0.3, 0.7, (b, t)),
        r.uniform(0.05, 0.3, (b, t)), r.uniform(0.05, 0.3, (b, t)),
    ], -1).astype(np.float32)
    counts = [3, 4, 1]
    valid = np.zeros((b, t), bool)
    for i, n in enumerate(counts):
        valid[i, :n] = True
    pm = (r.uniform(0, 1, (b, t, v)) < 0.3).astype(np.float32)
    pm /= np.maximum(pm.sum(-1, keepdims=True), 1)

    col4row, row4col = mdetr_hungarian_match(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(tboxes),
        jnp.asarray(valid), jnp.asarray(pm))
    col4row = np.asarray(col4row)

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    def xyxy(bx):
        cx, cy, w, h = bx[..., 0], bx[..., 1], bx[..., 2], bx[..., 3]
        return np.stack([cx - w / 2, cy - h / 2, cx + w / 2,
                         cy + h / 2], -1)

    def giou(a, bx):
        area = lambda z: (z[..., 2] - z[..., 0]) * (z[..., 3] - z[..., 1])
        lt = np.maximum(a[:, None, :2], bx[None, :, :2])
        rb = np.minimum(a[:, None, 2:], bx[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        union = area(a)[:, None] + area(bx)[None] - inter
        iou = inter / union
        lt2 = np.minimum(a[:, None, :2], bx[None, :, :2])
        rb2 = np.maximum(a[:, None, 2:], bx[None, :, 2:])
        hull = np.clip(rb2 - lt2, 0, None)
        hull = hull[..., 0] * hull[..., 1]
        return iou - (hull - union) / hull

    for i, n in enumerate(counts):
        prob = softmax(logits[i])
        cc = -(prob[:, None, :] * pm[i, None, :n, :]).sum(-1)
        cb = np.abs(boxes[i][:, None] - tboxes[i][None, :n]).sum(-1)
        cg = -giou(xyxy(boxes[i]), xyxy(tboxes[i, :n]))
        cost = 1 * cc + 5 * cb + 2 * cg
        rows, cols = linear_sum_assignment(cost)
        want = {r_: c_ for r_, c_ in zip(rows, cols)}
        got = {qi: ci for qi, ci in enumerate(col4row[i]) if ci >= 0}
        assert got == want, (i, got, want)
