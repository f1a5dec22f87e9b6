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


def _tiny_inputs(seed=4):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(0, 60, (2, 6)).astype(np.int32)
    pad = np.zeros((2, 6), np.int32)
    return jnp.asarray(img), jnp.asarray(ids), jnp.asarray(pad)


def _calibrate_and_build(kw, params, img, ids, pad, margin=1.0):
    """calib pass -> build_quant_collection for the static model."""
    from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder
    from simvg_tpu.ops.quant import build_quant_collection

    enc_cal = BEiT3Encoder(BEiT3Config(quant="int8_calib", **kw))
    skel_cal = jax.eval_shape(
        lambda: enc_cal.init(jax.random.PRNGKey(0), img, ids, pad))
    qzero = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                         skel_cal["quant"])
    _, mut = enc_cal.apply(
        {"params": params["params"], "quant": qzero}, img, ids, pad,
        mutable=["quant"])

    enc_st = BEiT3Encoder(BEiT3Config(quant="int8_static", **kw))
    skel_st = jax.eval_shape(
        lambda: enc_st.init(jax.random.PRNGKey(0), img, ids, pad))
    qcol = build_quant_collection(params["params"], skel_st["quant"],
                                  mut["quant"], margin=margin)
    return enc_st, {"params": params["params"], "quant": qcol}


def test_int8_static_matches_dynamic(scan=False):
    """Calibrated static path tracks fp32 about as well as dynamic
    (same weights, activation scales from a calibration batch)."""
    from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder

    kw = dict(img_size=32, patch_size=16, embed_dim=32, num_heads=4,
              ffn_dim=64, num_layers=2, vocab_size=60,
              drop_path_rate=0.0, dtype=jnp.float32, scan_layers=scan)
    img, ids, pad = _tiny_inputs()
    enc_fp = BEiT3Encoder(BEiT3Config(**kw))
    params = enc_fp.init(jax.random.PRNGKey(0), img, ids, pad)
    enc_st, vars_st = _calibrate_and_build(kw, params, img, ids, pad)

    # calib collection shapes: one amax per quantized layer
    fi, ft, fc = enc_fp.apply(params, img, ids, pad)
    qi, qt, qc = jax.jit(
        lambda v: enc_st.apply(v, img, ids, pad))(vars_st)
    for a, b in ((qi, fi), (qt, ft), (qc, fc)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.abs(a - b).mean() / (np.abs(b).mean() + 1e-6)
        assert rel < 0.15, rel
        assert np.isfinite(a).all()
        assert not np.allclose(a, b)  # actually quantized


def test_int8_static_composes_with_scan_layers():
    test_int8_static_matches_dynamic(scan=True)


def test_int8_calib_records_amax():
    from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder

    kw = dict(img_size=32, patch_size=16, embed_dim=32, num_heads=4,
              ffn_dim=64, num_layers=2, vocab_size=60,
              drop_path_rate=0.0, dtype=jnp.float32)
    img, ids, pad = _tiny_inputs(5)
    enc = BEiT3Encoder(BEiT3Config(quant="int8_calib", **kw))
    v = enc.init(jax.random.PRNGKey(0), img, ids, pad)
    _, mut = enc.apply(v, img, ids, pad, mutable=["quant"])
    leaves = jax.tree.leaves(mut["quant"])
    assert leaves and all(float(l.max()) > 0 for l in leaves)
    # calib forward == plain fp forward (no quantization noise)
    enc_fp = BEiT3Encoder(BEiT3Config(**kw))
    fi, _, _ = enc_fp.apply({"params": v["params"]}, img, ids, pad)
    ci, _, _ = enc.apply(v, img, ids, pad)
    np.testing.assert_allclose(np.asarray(ci), np.asarray(fi),
                               rtol=1e-5, atol=1e-5)


def test_quant_collection_npz_roundtrip_and_attach(tmp_path):
    """save/load_quant_collection + attach_static_quant (the CLI
    serving path: tools/misc/quantize_serving.py -> tools/test.py
    --quant-collection)."""
    from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder
    from simvg_tpu.ops.quant import (
        attach_static_quant,
        load_quant_collection,
        save_quant_collection,
    )

    kw = dict(img_size=32, patch_size=16, embed_dim=32, num_heads=4,
              ffn_dim=64, num_layers=2, vocab_size=60,
              drop_path_rate=0.0, dtype=jnp.float32)
    img, ids, pad = _tiny_inputs()
    enc = BEiT3Encoder(BEiT3Config(quant="int8_static", **kw))
    vars0 = dict(enc.init(jax.random.PRNGKey(0), img, ids, pad))
    skel = vars0.pop("quant")

    # on-the-fly attach (no .npz): rebuilds w_q/s_w from the params
    v1 = attach_static_quant(dict(vars0), skel)
    assert "quant" in v1
    o1 = enc.apply(v1, img, ids, pad)

    # npz roundtrip attach: byte-identical collection -> same output
    f = str(tmp_path / "q.npz")
    save_quant_collection(f, jax.device_get(v1["quant"]))
    v2 = attach_static_quant(dict(vars0), skel, quant_npz=f)
    loaded = load_quant_collection(f)
    for a, b in zip(jax.tree.leaves(loaded),
                    jax.tree.leaves(v1["quant"])):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    o2 = enc.apply(v2, img, ids, pad)
    for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # non-quant model: variables pass through untouched
    assert attach_static_quant(vars0, None) is vars0


def test_attach_requantizes_weights_from_given_params(tmp_path):
    """attach_static_quant(ema_params, skel, npz) must quantize the
    weights of the params being ATTACHED while keeping the npz's
    calibrated activation scales — serving EMA weights with the raw
    weights' w_q (or with act_scale reset to 1.0, which saturates) was
    the round-3 review's top finding."""
    from flax import traverse_util

    from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder
    from simvg_tpu.ops.quant import (
        attach_static_quant,
        build_quant_collection,
        save_quant_collection,
    )

    kw = dict(img_size=32, patch_size=16, embed_dim=32, num_heads=4,
              ffn_dim=64, num_layers=2, vocab_size=60,
              drop_path_rate=0.0, dtype=jnp.float32)
    img, ids, pad = _tiny_inputs()
    enc = BEiT3Encoder(BEiT3Config(quant="int8_static", **kw))
    vars0 = dict(enc.init(jax.random.PRNGKey(0), img, ids, pad))
    skel = vars0.pop("quant")

    # calibrate on the raw weights -> realistic (non-1.0) act scales
    calib = BEiT3Encoder(BEiT3Config(quant="int8_calib", **kw))
    _, mut = calib.apply({"params": vars0["params"]}, img, ids, pad,
                         mutable=["quant"])
    qcol = build_quant_collection(vars0["params"], skel,
                                  act_amax=mut["quant"])
    f = str(tmp_path / "q.npz")
    save_quant_collection(f, jax.device_get(qcol))

    # "EMA" weights: a perturbed copy of the raw params
    ema_params = jax.tree.map(lambda x: x * 1.5, vars0["params"])
    v = attach_static_quant({"params": ema_params}, skel, quant_npz=f)

    flat_q = traverse_util.flatten_dict(v["quant"])
    flat_npz = traverse_util.flatten_dict(qcol)
    fresh = traverse_util.flatten_dict(
        build_quant_collection(ema_params, skel))
    saw_w, saw_a = False, False
    for path, leaf in flat_q.items():
        if path[-1] in ("w_q", "s_w"):
            # weights must come from the EMA params, not the npz
            # (jit-vs-eager reduction order gives ~1e-11 noise; a
            # boundary round can shift one int8 step)
            np.testing.assert_allclose(
                np.asarray(leaf, np.float32),
                np.asarray(fresh[path], np.float32),
                rtol=1e-5, atol=1.0 if path[-1] == "w_q" else 0.0)
            if path[-1] == "s_w":
                assert not np.allclose(np.asarray(leaf),
                                       np.asarray(flat_npz[path]))
            saw_w = True
        elif path[-1] == "act_scale":
            # activation scales must come from the calibrated npz
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(flat_npz[path]))
            assert float(np.asarray(leaf).max()) != 1.0
            saw_a = True
    assert saw_w and saw_a


def test_int8_empty_segment_single_modality():
    """Vision-only / text-only encodes route a zero-length segment
    through every dense; dynamic and calib quantization must not
    reduce over the empty array (review finding: ValueError 'zero-size
    array to reduction operation max')."""
    from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder

    kw = dict(img_size=32, patch_size=16, embed_dim=32, num_heads=4,
              ffn_dim=64, num_layers=2, vocab_size=60,
              drop_path_rate=0.0, dtype=jnp.float32)
    img, ids, pad = _tiny_inputs()
    for mode in ("int8", "int8_calib", "int8_static"):
        enc = BEiT3Encoder(BEiT3Config(quant=mode, **kw))
        v = enc.init(jax.random.PRNGKey(0), img, ids, pad)
        iv, _, _ = enc.apply(v, images=img)  # vision-only
        assert np.all(np.isfinite(np.asarray(iv)))
        _, tv, _ = enc.apply(v, text_ids=ids,
                             text_padding_mask=pad)  # text-only
        assert np.all(np.isfinite(np.asarray(tv)))


def test_quant_refuses_training_apply():
    """ADVICE r3 (medium): int8 rounding has no STE, so a training-mode
    apply (deterministic=False) with quant set must be refused loudly
    instead of silently zeroing encoder gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from simvg_tpu.models import SimVGModel, SimVGConfig
    from simvg_tpu.models.beit3 import BEiT3Config
    from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig

    def build(**kw):
        return SimVGModel(SimVGConfig(
            beit3=BEiT3Config(
                img_size=32, patch_size=16, embed_dim=16, num_heads=2,
                ffn_dim=32, num_layers=2, vocab_size=64,
                drop_path_rate=0.0, dtype=jnp.float32, **kw),
            head=TGQSHeadConfig(num_queries=1, in_channels=16,
                                embed_dim=16, num_decoder_layers=1,
                                num_tgqg_layers=1)))

    batch = dict(
        image=np.zeros((2, 32, 32, 3), np.float32),
        text_ids=np.ones((2, 4), np.int32),
        text_padding_mask=np.zeros((2, 4), np.int32),
        img_shape=np.full((2, 2), 32, np.int32))

    ref = build()
    params = ref.init(jax.random.PRNGKey(0), **batch)

    for kw in ({"quant": "int8"},
               {"token_prune_keep": 2, "token_prune_layer": 0,
                "token_prune_force": True}):
        m = build(**kw)
        # init must still work (full param tree for restore templates)
        v = m.init(jax.random.PRNGKey(0), **batch)
        assert jax.tree.structure(
            v.get("params")) == jax.tree.structure(params["params"])
        with pytest.raises(ValueError, match="serving-only"):
            m.apply(v, **batch, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})


def test_int8_qat_forward_matches_dynamic_and_grads_flow():
    """quant='int8_qat' (fake-quant + straight-through estimator):
    the forward sees serving-time int8 rounding (matches the dynamic
    w8a8 path up to accumulation dtype) while gradients flow as if
    unquantized — the QAT mode the serving-only guard points users at."""
    import numpy as np_

    from simvg_tpu.ops.quant import Int8Dense

    x = jnp.asarray(np_.random.default_rng(0).normal(size=(4, 16)),
                    jnp.float32)
    qat = Int8Dense(8, dtype=jnp.float32, mode="qat")
    dyn = Int8Dense(8, dtype=jnp.float32, mode="dynamic")
    dense = __import__("flax.linen", fromlist=["Dense"]).Dense(8)

    v = qat.init(jax.random.PRNGKey(0), x)
    y_qat = qat.apply(v, x)
    y_dyn = dyn.apply(v, x)
    # same rounding decisions; only the accumulation differs (f32
    # matmul of dequantized values vs int32 MXU accumulation)
    np_.testing.assert_allclose(np_.asarray(y_qat), np_.asarray(y_dyn),
                                rtol=1e-4, atol=1e-4)

    # STE: gradients are the straight-through (unquantized) gradients,
    # not zero — compare to the plain Dense gradient on the same params
    def loss_qat(params):
        return (qat.apply(params, x) ** 2).sum()

    def loss_dense(params):
        return (dense.apply(params, x) ** 2).sum()

    g_qat = jax.grad(loss_qat)(v)["params"]["kernel"]
    g_dense = jax.grad(loss_dense)(v)["params"]["kernel"]
    assert float(jnp.abs(g_qat).max()) > 0.0
    # direction agreement: the fake-quant forward perturbs values by
    # <1% (127-level grid), so gradients track the dense ones closely
    cos = (g_qat * g_dense).sum() / (
        jnp.linalg.norm(g_qat) * jnp.linalg.norm(g_dense))
    assert float(cos) > 0.99, float(cos)


def test_int8_qat_training_apply_allowed_then_serves_static():
    """The training guard admits int8_qat (its whole point) while still
    refusing the serving modes; a QAT param tree then attaches an
    int8_static quant collection unchanged (same layout)."""
    from simvg_tpu.models import SimVGConfig, SimVGModel
    from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder
    from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig
    from simvg_tpu.ops.quant import attach_static_quant

    kw = dict(img_size=32, patch_size=16, embed_dim=16, num_heads=2,
              ffn_dim=32, num_layers=1, vocab_size=30,
              drop_path_rate=0.0, dtype=jnp.float32)

    def build(quant):
        return SimVGModel(SimVGConfig(
            beit3=BEiT3Config(quant=quant, **kw),
            head=TGQSHeadConfig(num_queries=1, in_channels=16,
                                embed_dim=16, num_decoder_layers=1,
                                num_tgqg_layers=1, attn_dropout=0.0,
                                ffn_dropout=0.0, dtype=jnp.float32)))

    batch = dict(
        image=np.zeros((2, 32, 32, 3), np.float32),
        text_ids=np.ones((2, 4), np.int32),
        text_padding_mask=np.zeros((2, 4), np.int32),
        img_shape=np.full((2, 2), 32, np.int32))

    qat = build("int8_qat")
    v = qat.init(jax.random.PRNGKey(0), **batch)
    # training apply runs (deterministic=False) and is differentiable
    def loss(params):
        out = qat.apply(params, **batch, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        return (out["bbox_token"].astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(v)
    leaf = g["params"]["beit3"]["layers_0"]["ffn"]["fc1_A"]["kernel"]
    assert float(jnp.abs(leaf).max()) > 0.0

    # the QAT param tree serves under int8_static with no conversion
    static = build("int8_static")
    vs = dict(static.init(jax.random.PRNGKey(0), **batch))
    skel = vs.pop("quant")
    assert jax.tree.structure(vs["params"]) == jax.tree.structure(
        v["params"])
    served = attach_static_quant({"params": v["params"]}, skel)
    out = static.apply(served, **batch)
    assert np.all(np.isfinite(np.asarray(out["bbox_token"])))


def test_encoder_level_guard_refuses_serving_quant_in_training():
    """Direct BEiT3Encoder training applies (the task-head path, no
    SimVGModel wrapper) also refuse serving quant modes and admit qat."""
    from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder

    kw = dict(img_size=32, patch_size=16, embed_dim=16, num_heads=2,
              ffn_dim=32, num_layers=1, vocab_size=60,
              drop_path_rate=0.1, dtype=jnp.float32)
    img, ids, pad = _tiny_inputs(7)
    plain = BEiT3Encoder(BEiT3Config(**kw))
    v = plain.init(jax.random.PRNGKey(0), img, ids, pad)

    bad = BEiT3Encoder(BEiT3Config(quant="int8", **kw))
    import pytest
    with pytest.raises(ValueError, match="serving-only"):
        bad.apply(v, img, ids, pad, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})

    ok = BEiT3Encoder(BEiT3Config(quant="int8_qat", **kw))
    out = ok.apply(v, img, ids, pad, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out[2], np.float32)).all()
