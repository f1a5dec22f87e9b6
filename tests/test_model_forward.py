"""Model forward shape/semantics tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.models import SimVGModel, SimVGConfig
from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder
from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig
from simvg_tpu.models.model import decode_predictions


def _cfg(num_queries=2):
    return SimVGConfig(
        beit3=BEiT3Config(img_size=64, patch_size=16, embed_dim=32,
                          num_heads=4, ffn_dim=64, num_layers=2,
                          vocab_size=100, drop_path_rate=0.0),
        head=TGQSHeadConfig(num_queries=num_queries, in_channels=32,
                            embed_dim=32, num_decoder_layers=3,
                            num_tgqg_layers=1, attn_dropout=0.0,
                            ffn_dropout=0.0),
    )


def _batch(b=2, t=8, img=64, seed=0):
    r = np.random.default_rng(seed)
    return dict(
        image=jnp.asarray(r.normal(size=(b, img, img, 3)), jnp.float32),
        text_ids=jnp.asarray(r.integers(1, 100, (b, t)), jnp.int32),
        text_padding_mask=jnp.zeros((b, t), jnp.int32).at[:, 5:].set(1),
        img_shape=jnp.asarray([[img, img]] * b, jnp.int32),
    )


def test_output_shapes():
    cfg = _cfg()
    model = SimVGModel(cfg)
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), **batch)
    out = model.apply(params, **batch)
    assert out["class_decoder"].shape == (3, 2, 2, 2)
    assert out["bbox_decoder"].shape == (3, 2, 2, 4)
    assert out["class_token"].shape == (1, 2, 2, 2)
    assert out["bbox_token"].shape == (1, 2, 2, 4)
    assert bool(jnp.isfinite(out["bbox_decoder"]).all())
    assert float(out["bbox_decoder"].min()) >= 0.0
    assert float(out["bbox_decoder"].max()) <= 1.0


def test_text_padding_invariance():
    """Changing token ids at PADDED positions must not change outputs
    (padding masked in attention and zeroed post-embedding,
    beit3_base.py:367)."""
    cfg = _cfg()
    model = SimVGModel(cfg)
    batch = _batch(seed=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    out1 = model.apply(params, **batch)

    batch2 = dict(batch)
    ids = np.asarray(batch["text_ids"]).copy()
    ids[:, 5:] = 77  # perturb padded positions only
    batch2["text_ids"] = jnp.asarray(ids)
    out2 = model.apply(params, **batch2)
    np.testing.assert_allclose(
        np.asarray(out1["bbox_decoder"]), np.asarray(out2["bbox_decoder"]),
        atol=1e-6,
    )


def test_multiway_split_uses_separate_params():
    """Vision tokens must flow through the A parameters, text through B:
    zeroing B's ffn fc1 kernel changes text features but not (early)
    image-token behaviour in a 0-layer-interaction probe."""
    cfg = BEiT3Config(img_size=32, patch_size=16, embed_dim=16,
                      num_heads=2, ffn_dim=32, num_layers=1,
                      vocab_size=50, drop_path_rate=0.0)
    enc = BEiT3Encoder(cfg)
    b, t = 1, 4
    img = jnp.ones((b, 32, 32, 3))
    ids = jnp.ones((b, t), jnp.int32)
    mask = jnp.zeros((b, t), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), img, ids, mask)

    img1, txt1, cls1 = enc.apply(params, img, ids, mask)

    # zero the text-way ffn: text features change, and with attention
    # mixing, image features may change too -- but zeroing the TEXT
    # positional table must not affect a text-free quantity computed
    # before mixing. Instead verify A/B independence directly at the
    # param level: text pos table only touches text slice.
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    flat = jax.tree_util.tree_flatten_with_path(p2)[0]
    # find text_pos_embed embedding and zero it
    import flax

    p2 = flax.core.unfreeze(p2) if hasattr(flax.core, "unfreeze") else p2
    p2["params"]["text_pos_embed"]["embedding"] = jnp.zeros_like(
        p2["params"]["text_pos_embed"]["embedding"]
    )
    img2, txt2, cls2 = enc.apply(p2, img, ids, mask)
    assert not np.allclose(np.asarray(txt1), np.asarray(txt2))

    p3 = dict(params)
    p3 = {"params": dict(params["params"])}
    p3["params"]["vision_pos_embed"] = {
        "embedding": jnp.zeros_like(
            params["params"]["vision_pos_embed"]["embedding"]
        )
    }
    img3, txt3, _ = enc.apply(p3, img, ids, mask)
    assert not np.allclose(np.asarray(img1), np.asarray(img3))


def test_decode_predictions_rescale():
    logits = jnp.asarray([[[5.0, -5.0], [0.0, 0.0]]])  # q0 confident
    boxes = jnp.asarray([[[0.5, 0.5, 0.5, 0.5], [0.1, 0.1, 0.1, 0.1]]])
    img_shape = jnp.asarray([[100, 200]], jnp.int32)
    out = decode_predictions(logits, boxes, img_shape)
    np.testing.assert_allclose(
        np.asarray(out["best_box"][0]), [50.0, 25.0, 150.0, 75.0],
        atol=1e-4,
    )
    # clip: oversized box clamped to image bounds
    boxes2 = jnp.asarray([[[0.5, 0.5, 2.0, 2.0], [0.1, 0.1, 0.1, 0.1]]])
    out2 = decode_predictions(logits, boxes2, img_shape)
    np.testing.assert_allclose(
        np.asarray(out2["best_box"][0]), [0.0, 0.0, 200.0, 100.0],
        atol=1e-4,
    )
    # scale_factor divides (mix_detr_mb.py:149-151)
    sf = jnp.asarray([[2.0, 2.0, 2.0, 2.0]])
    out3 = decode_predictions(logits, boxes, img_shape, sf)
    np.testing.assert_allclose(
        np.asarray(out3["best_box"][0]), [25.0, 12.5, 75.0, 37.5],
        atol=1e-4,
    )


def test_encoder_enabled_and_no_tgqg_paths():
    """only_decoder=False engages the DETR encoder;
    text_guided_query_generation=False uses plain learned queries."""
    cfg = SimVGConfig(
        beit3=BEiT3Config(img_size=64, patch_size=16, embed_dim=32,
                          num_heads=4, ffn_dim=64, num_layers=1,
                          vocab_size=100, drop_path_rate=0.0),
        head=TGQSHeadConfig(num_queries=2, in_channels=32, embed_dim=32,
                            num_decoder_layers=1, num_encoder_layers=1,
                            only_decoder=False,
                            text_guided_query_generation=False,
                            attn_dropout=0.0, ffn_dropout=0.0),
    )
    model = SimVGModel(cfg)
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), **batch)
    assert "encoder" in params["params"]["head"]
    assert "tgqg" not in params["params"]["head"]
    out = model.apply(params, **batch)
    assert np.isfinite(np.asarray(out["bbox_decoder"])).all()


def test_scan_flagship_matches_unrolled_full_model():
    """scan_layers at the full-model level (encoder + head)."""
    from tools.convert_checkpoint import stack_scan_layers

    mk = lambda scan: SimVGModel(SimVGConfig(
        beit3=BEiT3Config(img_size=64, patch_size=16, embed_dim=32,
                          num_heads=4, ffn_dim=64, num_layers=2,
                          vocab_size=100, drop_path_rate=0.0,
                          scan_layers=scan),
        head=TGQSHeadConfig(num_queries=1, in_channels=32, embed_dim=32,
                            num_decoder_layers=1, num_tgqg_layers=1,
                            attn_dropout=0.0, ffn_dropout=0.0),
    ))
    batch = _batch()
    m_u, m_s = mk(False), mk(True)
    p_u = m_u.init(jax.random.PRNGKey(0), **batch)

    def deep(d):
        return {k: deep(v) for k, v in d.items()} if isinstance(
            d, dict) else np.asarray(d)

    p_s = stack_scan_layers(deep(p_u))
    o_u = m_u.apply(p_u, **batch)
    o_s = m_s.apply(p_s, **batch)
    np.testing.assert_allclose(np.asarray(o_u["bbox_decoder"]),
                               np.asarray(o_s["bbox_decoder"]),
                               atol=1e-5)
