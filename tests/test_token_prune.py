"""Vision-token pruning (BEiT3Config.token_prune_keep): EViT-style
attention-aware token filtering for token-branch serving — a sequence-
length lever above the S=421 bandwidth floor (ROADMAP "Perf analysis";
no reference analogue).  No new parameters: a pruned model restores any
converted checkpoint unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder

KW = dict(img_size=64, patch_size=16, embed_dim=32, num_heads=4,
          ffn_dim=64, num_layers=3, vocab_size=60, drop_path_rate=0.0,
          dtype=jnp.float32)
P = (64 // 16) ** 2  # 16 patch tokens


def _inputs(b=2, t=6, seed=0):
    r = np.random.default_rng(seed)
    img = jnp.asarray(r.normal(size=(b, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(r.integers(1, 60, (b, t)), jnp.int32)
    pad = jnp.zeros((b, t), jnp.int32).at[:, 4:].set(1)
    return img, ids, pad


def test_prune_params_and_shapes():
    """Pruned encoder: identical param tree (checkpoints load
    unchanged), img_feat shrinks to [B, keep, D], text/cls intact."""
    img, ids, pad = _inputs()
    full = BEiT3Encoder(BEiT3Config(**KW))
    pruned = BEiT3Encoder(BEiT3Config(token_prune_keep=5,
                                      token_prune_layer=1,
                                      token_prune_force=True, **KW))
    v = full.init(jax.random.PRNGKey(0), img, ids, pad)
    vp = pruned.init(jax.random.PRNGKey(0), img, ids, pad)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vp))

    iv, tv, cv = pruned.apply(v, img, ids, pad)
    assert iv.shape == (2, 5, 32)
    assert tv.shape == (2, 6, 32) and cv.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(iv)))


def test_prune_keep_all_is_identity():
    """keep = ALL patch tokens -> the top-k gather is the identity
    permutation (indices sorted back to spatial order), so every output
    must match the unpruned encoder (proves the gather, the split
    bookkeeping, and the rebuilt padding mask are all sound)."""
    img, ids, pad = _inputs(seed=1)
    full = BEiT3Encoder(BEiT3Config(**KW))
    v = full.init(jax.random.PRNGKey(0), img, ids, pad)
    ri, rt, rc = full.apply(v, img, ids, pad)

    noop = BEiT3Encoder(BEiT3Config(token_prune_keep=P,
                                    token_prune_layer=1, **KW))
    iv, tv, cv = noop.apply(v, img, ids, pad)
    np.testing.assert_allclose(np.asarray(iv), np.asarray(ri),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tv), np.asarray(rt),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cv), np.asarray(rc),
                               rtol=1e-6, atol=1e-6)

    # keep >= split (CLS + patches) is rejected
    with pytest.raises(AssertionError):
        BEiT3Encoder(BEiT3Config(token_prune_keep=P + 1,
                                 token_prune_layer=1, **KW)).apply(
            v, img, ids, pad)


def test_prune_is_exact_subset_at_prune_point():
    """The kept tokens immediately after the prune are EXACTLY rows of
    the unpruned layer-k output (same layer weights, same inputs up to
    layer k), i.e. pruning only ever drops rows, never alters them.
    Verified by capturing layer-k intermediates from both encoders."""
    img, ids, pad = _inputs(seed=2)
    keep, layer = 5, 1
    full = BEiT3Encoder(BEiT3Config(**KW))
    pruned = BEiT3Encoder(BEiT3Config(token_prune_keep=keep,
                                      token_prune_layer=layer,
                                      token_prune_force=True, **KW))
    v = full.init(jax.random.PRNGKey(0), img, ids, pad)

    filt = (lambda mdl, _: bool(mdl.name) and "layers_" in mdl.name)
    _, st_f = full.apply(v, img, ids, pad,
                         capture_intermediates=filt)
    _, st_p = pruned.apply(v, img, ids, pad,
                           capture_intermediates=filt)

    # layer k's own output is identical (pruning happens after it)
    out_f = st_f["intermediates"][f"layers_{layer}"]["__call__"][0]
    out_p = st_p["intermediates"][f"layers_{layer}"]["__call__"][0]
    if isinstance(out_p, tuple) and len(out_p) == 2 and not isinstance(
            out_p[0], jnp.ndarray):
        out_p = out_p[0]  # (xs, cls_attn) when return_cls_attn
    vis_f = np.asarray(out_f[0] if isinstance(out_f, tuple) else out_f)
    vis_p = np.asarray(out_p[0])
    np.testing.assert_allclose(vis_p, vis_f, rtol=1e-6, atol=1e-6)

    # the NEXT layer's vision input rows in the pruned run are a
    # subset of the unpruned rows (CLS + some K patches)
    in_p = st_p["intermediates"][f"layers_{layer + 1}"]["__call__"]
    assert np.asarray(in_p[0][0]).shape[1] == 1 + keep


def test_prune_model_token_branch_only():
    """SimVGModel: pruned encoder serves branches='token' (decoder
    needs the grid and is refused)."""
    from simvg_tpu.models import SimVGConfig, SimVGModel
    from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig

    cfg = SimVGConfig(
        beit3=BEiT3Config(token_prune_keep=5, token_prune_layer=1,
                          token_prune_force=True, **KW),
        head=TGQSHeadConfig(num_queries=2, in_channels=32, embed_dim=32,
                            num_decoder_layers=2, num_tgqg_layers=1,
                            attn_dropout=0.0, ffn_dropout=0.0,
                            dtype=jnp.float32),
    )
    model = SimVGModel(cfg)
    img, ids, pad = _inputs()
    shp = jnp.full((2, 2), 64, jnp.int32)
    # default branches="both" maps to "token" (init + generic eval
    # paths work unchanged)
    v = model.init(jax.random.PRNGKey(0), image=img, text_ids=ids,
                   text_padding_mask=pad, img_shape=shp)
    out = model.apply(v, image=img, text_ids=ids,
                      text_padding_mask=pad, img_shape=shp)
    assert np.all(np.isfinite(np.asarray(out["bbox_token"])))
    # the decoder outputs are the head's explicit dummies
    assert float(np.abs(np.asarray(out["class_decoder"])).max()) == 0.0
    assert np.all(np.asarray(out["bbox_decoder"]) == 0.5)

    with pytest.raises(AssertionError, match="token branch only"):
        model.apply(v, image=img, text_ids=ids, text_padding_mask=pad,
                    img_shape=shp, branches="decoder")


def test_prune_composes_with_int8():
    """Both serving levers together: pruned sequence + w8a8 matmuls."""
    img, ids, pad = _inputs(seed=3)
    for quant in ("int8", "int8_static"):
        enc = BEiT3Encoder(BEiT3Config(token_prune_keep=5,
                                       token_prune_layer=1,
                                       token_prune_force=True,
                                       quant=quant, **KW))
        v = enc.init(jax.random.PRNGKey(0), img, ids, pad)
        iv, tv, cv = enc.apply(v, img, ids, pad)
        assert iv.shape == (2, 5, 32)
        assert np.all(np.isfinite(np.asarray(iv)))


def test_prune_composes_with_export(tmp_path):
    """A pruned model exports as an AOT serving artifact and the
    artifact's token predictions match the live eval step."""
    from simvg_tpu.engine.train import make_eval_step
    from simvg_tpu.export import (
        export_serving,
        load_exported,
        save_exported,
    )
    from simvg_tpu.models import SimVGConfig, SimVGModel
    from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig

    cfg = SimVGConfig(
        beit3=BEiT3Config(token_prune_keep=5, token_prune_layer=1,
                          token_prune_force=True, **KW),
        head=TGQSHeadConfig(num_queries=2, in_channels=32, embed_dim=32,
                            num_decoder_layers=2, num_tgqg_layers=1,
                            attn_dropout=0.0, ffn_dropout=0.0,
                            dtype=jnp.float32),
    )
    model = SimVGModel(cfg)
    img, ids, pad = _inputs()
    batch = dict(image=img, text_ids=ids, text_padding_mask=pad,
                 img_shape=jnp.full((2, 2), 64, jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), **batch)
    exp = export_serving(model, variables, batch, platforms=("cpu",))
    f = str(tmp_path / "pruned.jaxexp")
    save_exported(f, exp)
    out = load_exported(f).call(batch)
    direct = jax.jit(make_eval_step(model))(variables, batch)
    # separate compilations of the same program: fp-noise tolerance
    np.testing.assert_allclose(
        np.asarray(out["token"]["best_box"]),
        np.asarray(direct["token"]["best_box"]), rtol=1e-5, atol=1e-4)


def test_prune_refuses_training():
    """token_prune_keep is serving-only: a non-deterministic (training)
    apply must refuse rather than silently distill against the head's
    constant dummy decoder outputs (round-3 review finding)."""
    from simvg_tpu.models import SimVGConfig, SimVGModel
    from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig

    cfg = SimVGConfig(
        beit3=BEiT3Config(token_prune_keep=5, token_prune_layer=1,
                          token_prune_force=True, **KW),
        head=TGQSHeadConfig(num_queries=2, in_channels=32, embed_dim=32,
                            num_decoder_layers=2, num_tgqg_layers=1,
                            attn_dropout=0.0, ffn_dropout=0.0,
                            dtype=jnp.float32),
    )
    model = SimVGModel(cfg)
    img, ids, pad = _inputs()
    shp = jnp.full((2, 2), 64, jnp.int32)
    v = model.init(jax.random.PRNGKey(0), image=img, text_ids=ids,
                   text_padding_mask=pad, img_shape=shp)
    with pytest.raises(ValueError, match="serving-only"):
        model.apply(v, image=img, text_ids=ids, text_padding_mask=pad,
                    img_shape=shp, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})


def test_prune_layer_default_clamps_explicit_rejects():
    """Default prune layer (4) clamps on shallow models; an explicitly
    out-of-range layer errors instead of silently moving the prune."""
    img, ids, pad = _inputs()
    # default 4 on a 3-layer model -> clamped to 1, runs
    enc = BEiT3Encoder(BEiT3Config(token_prune_keep=5,
                                   token_prune_force=True, **KW))
    v = enc.init(jax.random.PRNGKey(0), img, ids, pad)
    iv, _, _ = enc.apply(v, img, ids, pad)
    assert iv.shape[1] == 5
    # explicit 2 on a 3-layer model (last prunable is 1) -> error
    bad = BEiT3Encoder(BEiT3Config(token_prune_keep=5,
                                   token_prune_layer=2, **KW))
    with pytest.raises(ValueError, match="out of range"):
        bad.init(jax.random.PRNGKey(0), img, ids, pad)


def test_attach_rejects_mismatched_calibration(tmp_path):
    """A calibration .npz whose act_scale paths don't match the model
    layout must fail loudly, not silently serve with saturating 1.0
    scales (round-3 review finding)."""
    import numpy as np_

    from simvg_tpu.ops.quant import attach_static_quant

    enc = BEiT3Encoder(BEiT3Config(quant="int8_static", **KW))
    img, ids, pad = _inputs()
    vars0 = dict(enc.init(jax.random.PRNGKey(0), img, ids, pad))
    skel = vars0.pop("quant")
    f = str(tmp_path / "wrong.npz")
    np_.savez(f, **{"beit3/other_layer/act_scale":
                    np_.ones((), np_.float32)})
    with pytest.raises(ValueError, match="different model layout"):
        attach_static_quant(dict(vars0), skel, quant_npz=f)


def test_prune_requires_unrolled_layers():
    img, ids, pad = _inputs()
    enc = BEiT3Encoder(BEiT3Config(token_prune_keep=5, scan_layers=True,
                                   **KW))
    with pytest.raises(AssertionError, match="scan_layers"):
        enc.init(jax.random.PRNGKey(0), img, ids, pad)


def test_prune_envelope_guard():
    """VERDICT r4: the measured accuracy envelope (prune at layer >=
    num_layers/3, keep >= 75% of patch tokens — ROADMAP 'Token
    pruning') is enforced by default; outside-envelope configs raise
    unless token_prune_force=True.  16 patch tokens -> min_keep=12;
    3 layers -> min_layer=1."""
    img, ids, pad = _inputs(seed=4)
    full = BEiT3Encoder(BEiT3Config(**KW))
    v = full.init(jax.random.PRNGKey(0), img, ids, pad)

    # in-envelope: keep=12 (75% of 16) at layer 1 runs without force
    ok = BEiT3Encoder(BEiT3Config(token_prune_keep=12,
                                  token_prune_layer=1, **KW))
    iv, _, _ = ok.apply(v, img, ids, pad)
    assert iv.shape == (2, 12, 32)

    # keep below the envelope floor refuses...
    bad = BEiT3Encoder(BEiT3Config(token_prune_keep=11,
                                   token_prune_layer=1, **KW))
    with pytest.raises(ValueError, match="measured-safe envelope"):
        bad.apply(v, img, ids, pad)
    # ...and force bypasses (the bench/lever-measurement path)
    forced = BEiT3Encoder(BEiT3Config(token_prune_keep=11,
                                      token_prune_layer=1,
                                      token_prune_force=True, **KW))
    iv, _, _ = forced.apply(v, img, ids, pad)
    assert iv.shape == (2, 11, 32)

    # a too-shallow prune layer refuses on a deeper model (6 layers ->
    # min_layer=2) even with keep at 100%
    deep = dict(KW, num_layers=6)
    shallow = BEiT3Encoder(BEiT3Config(token_prune_keep=P,
                                       token_prune_layer=1, **deep))
    v6 = BEiT3Encoder(BEiT3Config(**deep)).init(
        jax.random.PRNGKey(0), img, ids, pad)
    with pytest.raises(ValueError, match="measured-safe envelope"):
        shallow.apply(v6, img, ids, pad)


def test_prune_envelope_through_builder():
    """token_prune_force flows through the config-dict builder
    (build_model), so a user config outside the envelope fails at
    first apply with the envelope message, and force in the config
    dict unlocks it."""
    from simvg_tpu.models.builder import build_model

    def _cfg(**extra):
        return dict(
            type="MIXDETRMB",
            vis_enc=dict(type="beit3", img_size=64, patch_size=16,
                         embed_dim=32, num_heads=4, ffn_dim=64,
                         num_layers=3, vocab_size=60, drop_path_rate=0.0,
                         use_bf16=False, token_prune_layer=1, **extra),
            head=dict(type="TextGuidedQuerySelectKDDETRHead",
                      num_queries=2, in_channels=32, embed_dim=32,
                      num_decoder_layers=2, num_tgqg_layers=1),
        )

    img, ids, pad = _inputs()
    shp = jnp.full((2, 2), 64, jnp.int32)
    plain, _ = build_model(_cfg(), img_size=64)
    v = plain.init(jax.random.PRNGKey(0), image=img, text_ids=ids,
                   text_padding_mask=pad, img_shape=shp)
    bad, _ = build_model(_cfg(token_prune_keep=5), img_size=64)
    with pytest.raises(ValueError, match="measured-safe envelope"):
        bad.apply(v, image=img, text_ids=ids, text_padding_mask=pad,
                  img_shape=shp)
    forced, _ = build_model(_cfg(token_prune_keep=5,
                                 token_prune_force=True), img_size=64)
    out = forced.apply(v, image=img, text_ids=ids, text_padding_mask=pad,
                       img_shape=shp)
    assert np.all(np.isfinite(np.asarray(out["bbox_token"])))
