"""Smoke + contract tests for the legacy vision-encoder zoo
(simvg_tpu/models/vis_enc_zoo.py; reference registry
simvg/models/vis_encs/__init__.py:1-16).

Tiny shapes, CPU.  Each encoder: init, jitted forward, output
shape/finiteness, and (for the masked families) padding-invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simvg_tpu.models.vis_enc_zoo import (
    CSPDarknet,
    CvTMix,
    CvTMixConfig,
    DarkNet53,
    PVTv2Config,
    PyramidVisionTransformerV2,
    SwinConfig,
    SwinTransformer,
    ViLTConfig,
    ViLTEncoder,
    ViTDet,
    ViTDetConfig,
    ViTMix,
    ViTMixConfig,
    YOLOSConfig,
    YOLOSEncoder,
    build_vis_enc,
)


def _img(b=2, s=64):
    return jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (b, s, s, 3)), jnp.float32)


def _apply(model, *args, **kw):
    params = model.init(jax.random.PRNGKey(0), *args, **kw)
    out = jax.jit(lambda p, *a: model.apply(p, *a, **kw))(params, *args)
    return params, out


def test_darknet53_grid():
    enc = DarkNet53(stage_blocks=(1, 1, 1, 1, 1),
                    stage_widths=(8, 16, 32, 64, 128))
    _, out = _apply(enc, _img())
    assert out.shape == (2, 2, 2, 128)  # stride 32
    assert bool(jnp.isfinite(out).all())


def test_cspdarknet_grid():
    enc = CSPDarknet(stage_blocks=(1, 1, 1, 1),
                     stage_widths=(16, 32, 64, 128))
    _, out = _apply(enc, _img())
    assert out.shape == (2, 2, 2, 128)  # focus /2 then 4 stages /2
    assert bool(jnp.isfinite(out).all())


def test_swin_stages_and_shift():
    cfg = SwinConfig(patch_size=4, embed_dim=8, depths=(2, 2),
                     num_heads=(2, 2), window=4)
    enc = SwinTransformer(cfg)
    _, out = _apply(enc, _img(s=64))
    # 64/4 = 16 -> one merge -> 8; dim 8 -> 16
    assert out.shape == (2, 8, 8, 16)
    assert bool(jnp.isfinite(out).all())


def test_swin_nondivisible_input_padding():
    cfg = SwinConfig(patch_size=4, embed_dim=8, depths=(2,),
                     num_heads=(2,), window=7)
    enc = SwinTransformer(cfg)
    _, out = _apply(enc, _img(s=72))  # 18x18 grid, 7 doesn't divide
    assert out.shape == (2, 18, 18, 8)
    assert bool(jnp.isfinite(out).all())


def test_pvtv2_pyramid():
    cfg = PVTv2Config(dims=(8, 16, 32, 64), depths=(1, 1, 1, 1),
                      heads=(1, 2, 4, 8), sr_ratios=(8, 4, 2, 1),
                      mlp_ratios=(2, 2, 2, 2))
    enc = PyramidVisionTransformerV2(cfg)
    _, out = _apply(enc, _img())
    assert out.shape == (2, 2, 2, 64)  # strides 4,2,2,2 = /32
    assert bool(jnp.isfinite(out).all())


def _text(b=2, t=5, d=16):
    tf = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (b, t, d)), jnp.float32)
    mask = jnp.zeros((b, t), bool).at[:, -2:].set(True)
    return tf, mask


def test_vit_mix_joint_attention_padding_invariance():
    cfg = ViTMixConfig(patch_size=16, embed_dim=16, num_heads=2,
                       num_layers=2)
    enc = ViTMix(cfg)
    tf, mask = _text()
    params = enc.init(jax.random.PRNGKey(0), _img(), tf, mask)
    out = enc.apply(params, _img(), tf, mask)
    assert out["img_feat"].shape == (2, 4, 4, 16)
    assert out["text_feat"].shape == (2, 5, 16)
    # perturbing PADDED text features must not change image features
    tf2 = tf.at[:, -1].set(99.0)
    out2 = enc.apply(params, _img(), tf2, mask)
    np.testing.assert_allclose(np.asarray(out["img_feat"]),
                               np.asarray(out2["img_feat"]), atol=1e-5)


def test_cvt_mix_stages_and_text():
    cfg = CvTMixConfig(dims=(8, 16, 32), depths=(1, 1, 1),
                       heads=(1, 2, 4), mlp_ratio=2.0)
    enc = CvTMix(cfg)
    tf, mask = _text()
    _, out = _apply(enc, _img(), tf, mask)
    assert out["img_feat"].shape == (2, 4, 4, 32)  # strides 4,2,2
    assert out["text_feat"].shape == (2, 5, 32)
    assert bool(jnp.isfinite(out["img_feat"]).all())


def test_vitdet_window_global_interleave():
    cfg = ViTDetConfig(patch_size=16, embed_dim=16, num_heads=2,
                       num_layers=3, window=2, global_every=3)
    enc = ViTDet(cfg)
    _, out = _apply(enc, _img())
    assert out.shape == (2, 4, 4, 16)
    tf, mask = _text()
    params = enc.init(jax.random.PRNGKey(0), _img(), tf, mask)
    out2 = enc.apply(params, _img(), tf, mask)
    assert out2["text_feat"].shape == (2, 5, 16)


def test_yolos_det_tokens():
    cfg = YOLOSConfig(patch_size=16, embed_dim=16, num_heads=2,
                      num_layers=2, num_det_tokens=7)
    enc = YOLOSEncoder(cfg)
    _, out = _apply(enc, _img())
    assert out["img_feat"].shape == (2, 4, 4, 16)
    assert out["det_tokens"].shape == (2, 7, 16)


def test_vilt_joint_stream():
    cfg = ViLTConfig(patch_size=16, embed_dim=16, num_heads=2,
                     num_layers=2, vocab_size=50, max_text_len=8)
    enc = ViLTEncoder(cfg)
    ids = jnp.asarray([[3, 7, 9, 0, 0], [2, 5, 0, 0, 0]], jnp.int32)
    mask = jnp.asarray([[0, 0, 0, 1, 1], [0, 0, 1, 1, 1]], bool)
    params = enc.init(jax.random.PRNGKey(0), _img(), ids, mask)
    out = enc.apply(params, _img(), ids, mask)
    assert out["img_feat"].shape == (2, 4, 4, 16)
    assert out["cls_feat"].shape == (2, 16)
    assert out["text_feat"].shape == (2, 5, 16)
    # padded word ids must not affect the CLS feature
    ids2 = ids.at[0, 4].set(31)
    out2 = enc.apply(params, _img(), ids2, mask)
    np.testing.assert_allclose(np.asarray(out["cls_feat"]),
                               np.asarray(out2["cls_feat"]), atol=1e-5)


@pytest.mark.parametrize("typ,kw", [
    ("DarkNet53", dict(stage_blocks=(1, 1, 1, 1, 1),
                       stage_widths=(8, 8, 8, 8, 8))),
    ("DarknetMM", dict(stage_blocks=(1, 1, 1, 1, 1),
                       stage_widths=(8, 8, 8, 8, 8))),
    ("CSPDarknet", dict(stage_blocks=(1, 1, 1, 1),
                        stage_widths=(8, 8, 8, 8))),
    ("ResNet", dict(depths=(1, 1, 1, 1), widths=(8, 16, 32, 64))),
    ("SwinTransformer", dict(patch_size=4, embed_dim=8, depths=(1,),
                             num_heads=(2,))),
    ("SwinTransformerMM", dict(patch_size=4, embed_dim=8, depths=(1,),
                               num_heads=(2,))),
    ("PyramidVisionTransformerV2", dict(
        dims=(8, 8, 8, 8), depths=(1, 1, 1, 1), heads=(1, 1, 1, 1),
        sr_ratios=(8, 4, 2, 1), mlp_ratios=(2, 2, 2, 2))),
    ("VIT", dict(img_size=64, patch_size=16, embed_dim=16, num_heads=2,
                 ffn_dim=32, num_layers=1)),
])
def test_build_vis_enc_registry_vision(typ, kw):
    enc = build_vis_enc({"type": typ, **kw})
    _, out = _apply(enc, _img())
    assert out.ndim == 4 and bool(jnp.isfinite(out).all())


def test_build_vis_enc_unknown():
    with pytest.raises(KeyError):
        build_vis_enc({"type": "NoSuchBackbone"})


def test_build_composed_one_stage_model():
    """Reference OneStageModel composition through the config-dict
    builder (simvg/models/det_seg/one_stage.py:6-25 key surface)."""
    from simvg_tpu.models.builder import build_model

    model, loss_cfg = build_model({
        "type": "OneStageModel",
        "vis_enc": {"type": "DarkNet53",
                    "stage_blocks": (1, 1, 1, 1, 1),
                    "stage_widths": (8, 8, 8, 16, 16)},
        "lan_enc": {"type": "LSTM", "vocab_size": 50,
                    "word_emb_dim": 16, "hidden_size": 8},
        "fusion": {"type": "SimpleFusionv2", "embed_dim": 16,
                   "num_heads": 2},
        "head": {"type": "DETRHead", "num_queries": 3,
                 "in_channels": 16, "embed_dim": 16,
                 "num_encoder_layers": 1, "num_decoder_layers": 1,
                 "attn_dropout": 0.0, "ffn_dropout": 0.0},
    })
    img = _img()
    ids = jnp.asarray([[3, 7, 9, 0, 0], [2, 5, 0, 0, 0]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img, ids)
    out = model.apply(params, img, ids)
    assert out["bbox_decoder"].shape[-2:] == (3, 4)
    assert loss_cfg["branch_loss_weight"] == {"decoder": 1.0}
