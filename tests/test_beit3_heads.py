"""BEiT-3 task heads (modeling_finetune.py parity surface) + the
encoder's single-modality / attn_bias modes that serve them."""

import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder
from simvg_tpu.models.beit3_heads import (
    BEiT3ForCaptioning,
    BEiT3ForImageClassification,
    BEiT3ForRetrieval,
    BEiT3ForVisualQuestionAnswering,
    BEiT3ForVisualReasoning,
    captioning_uni_mask,
)

CFG = dict(img_size=32, patch_size=16, embed_dim=32, num_heads=4,
           ffn_dim=64, num_layers=2, vocab_size=60,
           drop_path_rate=0.0, dtype=jnp.float32)


def _data(b=2, t=6):
    r = np.random.default_rng(0)
    img = jnp.asarray(r.normal(size=(b, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(r.integers(2, 60, (b, t)), jnp.int32)
    mask = jnp.zeros((b, t), jnp.int32).at[:, t - 2:].set(1)
    return img, ids, mask


def test_encoder_single_modality_modes():
    cfg = BEiT3Config(**CFG)
    enc = BEiT3Encoder(cfg)
    img, ids, mask = _data()
    pj = enc.init(jax.random.PRNGKey(0), images=img, text_ids=ids,
                  text_padding_mask=mask)
    # vision-only: same vision params, text outputs None
    iv, tv, cv = enc.apply(pj, images=img)
    assert tv is None and iv.shape == (2, 4, 32) and cv.shape == (2, 32)
    # text-only
    it, tt, ct = enc.apply(pj, text_ids=ids, text_padding_mask=mask)
    assert it is None and ct is None and tt.shape == (2, 6, 32)
    # joint reference values
    ij, tj, cj = enc.apply(pj, images=img, text_ids=ids,
                           text_padding_mask=mask)
    # modalities interact in the joint pass: single-modality runs differ
    assert not np.allclose(np.asarray(iv), np.asarray(ij), atol=1e-4)
    for a in (iv, cv, tt, ij, tj, cj):
        assert np.isfinite(np.asarray(a, np.float32)).all()


def test_captioning_uni_mask_semantics():
    m = np.asarray(captioning_uni_mask(3, 4))
    assert m.shape == (7, 7)
    assert (m[:3, :3] == 0).all()          # image <-> image
    assert (m[3:, :3] == 0).all()          # caption -> image
    assert np.isinf(m[:3, 3:]).all()       # image -> caption blocked
    assert m[4, 3] == 0 and np.isinf(m[3, 4])  # causal caption


def test_caption_causality_end_to_end():
    """Changing a LATER caption token must not change earlier text
    features (the whole point of the uni mask)."""
    cfg = BEiT3Config(**CFG)
    model = BEiT3ForCaptioning(cfg)
    img, ids, _ = _data()
    mask = jnp.zeros_like(ids)
    params = model.init(jax.random.PRNGKey(0), img, ids, mask)
    out1 = np.asarray(model.apply(params, img, ids, mask))
    ids2 = ids.at[:, 4].set((ids[:, 4] + 7) % 58 + 2)
    out2 = np.asarray(model.apply(params, img, ids2, mask))
    np.testing.assert_allclose(out1[:, :4], out2[:, :4], atol=1e-5)
    assert not np.allclose(out1[:, 4:], out2[:, 4:], atol=1e-5)


def test_classification_vqa_reasoning_shapes():
    cfg = BEiT3Config(**CFG)
    img, ids, mask = _data()
    m1 = BEiT3ForImageClassification(cfg, num_classes=10)
    p1 = m1.init(jax.random.PRNGKey(0), img)
    assert m1.apply(p1, img).shape == (2, 10)

    m2 = BEiT3ForVisualQuestionAnswering(cfg, num_classes=13)
    p2 = m2.init(jax.random.PRNGKey(0), img, ids, mask)
    assert m2.apply(p2, img, ids, mask).shape == (2, 13)

    m3 = BEiT3ForVisualReasoning(cfg)
    p3 = m3.init(jax.random.PRNGKey(0), img, img, ids, mask)
    assert m3.apply(p3, img, img, ids, mask).shape == (2, 2)


def test_retrieval_heads_normalized_and_shared_encoder():
    cfg = BEiT3Config(**CFG)
    img, ids, mask = _data()
    m = BEiT3ForRetrieval(cfg)
    params = m.init(jax.random.PRNGKey(0), image=img, text_ids=ids,
                    padding_mask=mask)
    v, t, scale = m.apply(params, image=img, text_ids=ids,
                          padding_mask=mask)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(v, np.float32), axis=-1), 1.0,
        rtol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(t, np.float32), axis=-1), 1.0,
        rtol=1e-5)
    np.testing.assert_allclose(float(scale), np.log(1 / 0.07), rtol=1e-6)
    # single-modality inference calls reuse the same params
    v2, t2, _ = m.apply(params, image=img)
    assert t2 is None
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-6)


def test_caption_greedy_generate():
    cfg = BEiT3Config(**CFG)
    model = BEiT3ForCaptioning(cfg)
    img, ids, _ = _data()
    params = model.init(jax.random.PRNGKey(0), img, ids,
                        jnp.zeros_like(ids))
    out = BEiT3ForCaptioning.greedy_generate(
        model, params, img, bos_id=0, eos_id=2, max_len=5)
    out = np.asarray(out)
    assert out.shape == (2, 5) and (out[:, 0] == 0).all()
