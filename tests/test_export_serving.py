"""AOT serving export (simvg_tpu/export.py): serialize the jitted
serving forward + weights, deserialize, and get bit-identical
predictions — incl. batch-polymorphic and cross-platform (TPU from a
CPU host) exports.  No reference analogue (the reference serves from
the live torch process, simvg/apis/inference.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simvg_tpu.export import (
    export_serving,
    load_exported,
    make_serving_fn,
    save_exported,
)
from simvg_tpu.models import SimVGConfig, SimVGModel
from simvg_tpu.models.beit3 import BEiT3Config
from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig


def _cfg():
    return SimVGConfig(
        beit3=BEiT3Config(img_size=64, patch_size=16, embed_dim=32,
                          num_heads=4, ffn_dim=64, num_layers=2,
                          vocab_size=100, drop_path_rate=0.0,
                          dtype=jnp.float32),
        head=TGQSHeadConfig(num_queries=2, in_channels=32,
                            embed_dim=32, num_decoder_layers=2,
                            num_tgqg_layers=1, attn_dropout=0.0,
                            ffn_dropout=0.0, dtype=jnp.float32),
    )


def _batch(b=2, t=8, img=64, seed=0):
    r = np.random.default_rng(seed)
    return dict(
        image=jnp.asarray(r.normal(size=(b, img, img, 3)), jnp.float32),
        text_ids=jnp.asarray(r.integers(1, 100, (b, t)), jnp.int32),
        text_padding_mask=jnp.zeros((b, t), jnp.int32).at[:, 5:].set(1),
        img_shape=jnp.asarray([[img, img]] * b, jnp.int32),
    )


@pytest.fixture(scope="module")
def model_and_vars():
    model = SimVGModel(_cfg())
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), **batch)
    return model, variables


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb) and len(la) > 0
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_export_roundtrip_bit_identical(model_and_vars, tmp_path):
    model, variables = model_and_vars
    batch = _batch()
    direct = jax.jit(make_serving_fn(model, variables))(batch)
    assert set(direct) == {"decoder", "token"}

    exp = export_serving(model, variables, batch, platforms=("cpu",))
    f = str(tmp_path / "m.jaxexp")
    save_exported(f, exp)
    out = load_exported(f).call(batch)
    _assert_tree_equal(out, direct)


def test_export_polymorphic_batch(model_and_vars, tmp_path):
    """One artifact serves any batch size (symbolic leading dim)."""
    model, variables = model_and_vars
    exp = export_serving(model, variables, _batch(b=2),
                         platforms=("cpu",), polymorphic_batch=True)
    f = str(tmp_path / "m.jaxexp")
    save_exported(f, exp)
    exp = load_exported(f)
    for b in (1, 3):
        batch = _batch(b=b, seed=b)
        direct = jax.jit(make_serving_fn(model, variables))(batch)
        out = exp.call(batch)
        assert out["token"]["best_box"].shape == (b, 4)
        _assert_tree_equal(out, direct)


def test_export_for_tpu_from_cpu_host(model_and_vars, tmp_path):
    """Cross-platform lowering: a TPU artifact exports + serializes on
    a CPU-only host (the deployment story); calling it on CPU raises."""
    model, variables = model_and_vars
    batch = _batch()
    exp = export_serving(model, variables, batch, platforms=("tpu",))
    assert exp.platforms == ("tpu",)
    f = str(tmp_path / "m_tpu.jaxexp")
    save_exported(f, exp)
    exp = load_exported(f)
    if jax.default_backend() != "tpu":
        with pytest.raises(Exception):
            exp.call(batch)


def test_export_int8_static_serving(model_and_vars, tmp_path):
    """The quantized serving path exports too: the baked-in constants
    are the pre-quantized int8 weights + calibrated scales."""
    from simvg_tpu.ops.quant import attach_static_quant

    import dataclasses

    _, variables = model_and_vars
    qcfg = _cfg()
    qcfg = dataclasses.replace(
        qcfg, beit3=dataclasses.replace(qcfg.beit3,
                                        quant="int8_static"))
    qmodel = SimVGModel(qcfg)
    batch = _batch()
    qvars = dict(qmodel.init(jax.random.PRNGKey(0), **batch))
    skel = qvars.pop("quant")
    qvars = attach_static_quant(
        {"params": variables["params"]}, skel)

    direct = jax.jit(make_serving_fn(qmodel, qvars))(batch)
    exp = export_serving(qmodel, qvars, batch, platforms=("cpu",))
    f = str(tmp_path / "m_q.jaxexp")
    save_exported(f, exp)
    out = load_exported(f).call(batch)
    _assert_tree_equal(out, direct)


def test_export_weights_as_argument(model_and_vars, tmp_path):
    """``bake_weights=False``: one compiled artifact serves many
    checkpoints — ``exp.call(variables, batch)``.  Bit-identical to the
    in-process jit of the same weights-as-argument program; within fp32
    fusion noise of the baked path (constants fold differently)."""
    from simvg_tpu.engine.train import make_eval_step

    model, variables = model_and_vars
    batch = _batch()
    direct = jax.jit(make_eval_step(model))(variables, batch)

    exp = export_serving(model, variables, batch, platforms=("cpu",),
                         bake_weights=False)
    f = str(tmp_path / "m_arg.jaxexp")
    save_exported(f, exp)
    exp = load_exported(f)
    _assert_tree_equal(exp.call(variables, batch), direct)

    baked = jax.jit(make_serving_fn(model, variables))(batch)
    for x, y in zip(jax.tree.leaves(direct), jax.tree.leaves(baked)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-4)

    # A different checkpoint through the SAME artifact gives different
    # (but finite) predictions — the weights really are an argument.
    vars2 = model.init(jax.random.PRNGKey(7), **batch)
    out2 = exp.call(vars2, batch)
    assert bool(jnp.isfinite(out2["token"]["best_box"]).all())
    assert not np.allclose(np.asarray(out2["token"]["best_score"]),
                           np.asarray(direct["token"]["best_score"]))


def test_export_cli_e2e(tmp_path):
    """tools/misc/export_serving.py end-to-end: export (random init,
    multi-platform, polymorphic) -> deserialize -> call."""
    import os
    import subprocess
    import sys as _sys

    from util_synth import make_refcoco_style

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = tmp_path / "synth"
    make_refcoco_style(str(root), n_train=4, n_val=4)
    out = str(tmp_path / "m.jaxexp")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        _sys.executable, "tools/misc/export_serving.py",
        "configs/smoke/tiny_synth.py", "--platform", "cpu",
        "--target-platforms", "cpu", "tpu", "--polymorphic-batch",
        "--out", out, "--cfg-options",
        f"data.val.annsfile={root}/instances.json",
        f"data.val.imgsfile={root}/images",
    ]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    import json
    meta = json.loads(proc.stdout.strip().splitlines()[-1])
    assert meta["platforms"] == ["cpu", "tpu"]
    assert os.path.getsize(out) == meta["bytes"]
    assert os.path.exists(out + ".json")

    exp = load_exported(out)
    b, t, img = 2, meta["inputs"]["text_ids"][0][1], meta["img_size"]
    r = np.random.default_rng(0)
    preds = exp.call(dict(
        image=jnp.asarray(r.normal(size=(b, img, img, 3)), jnp.float32),
        text_ids=jnp.asarray(r.integers(1, 100, (b, t)), jnp.int32),
        text_padding_mask=jnp.zeros((b, t), jnp.int32),
        img_shape=jnp.asarray([[img, img]] * b, jnp.int32),
    ))
    assert preds["token"]["best_box"].shape == (b, 4)
    assert bool(jnp.isfinite(preds["token"]["best_box"]).all())


def test_export_cli_normalize_on_device(tmp_path):
    """normalize_on_device configs must export with the host Normalize
    op STRIPPED (uint8 input spec) and device normalization baked —
    building the sample from a host-normalized loader while also baking
    device_norm double-normalized every input (round-3 review)."""
    import json
    import os
    import subprocess
    import sys as _sys

    from util_synth import make_refcoco_style

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = tmp_path / "synth"
    make_refcoco_style(str(root), n_train=2, n_val=2)
    out = str(tmp_path / "m.jaxexp")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        _sys.executable, "tools/misc/export_serving.py",
        "configs/smoke/tiny_synth.py", "--platform", "cpu",
        "--target-platforms", "cpu", "--out", out, "--cfg-options",
        "normalize_on_device=True",
        f"data.val.annsfile={root}/instances.json",
        f"data.val.imgsfile={root}/images",
    ]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    meta = json.loads(proc.stdout.strip().splitlines()[-1])
    # the artifact's contract is RAW uint8 images
    assert meta["inputs"]["image"][1] == "uint8", meta["inputs"]

    # and it normalizes internally: uint8 in -> finite boxes out
    exp = load_exported(out)
    b = meta["inputs"]["image"][0][0]
    t = meta["inputs"]["text_ids"][0][1]
    img = meta["img_size"]
    r = np.random.default_rng(0)
    preds = exp.call(dict(
        image=jnp.asarray(r.integers(0, 255, (b, img, img, 3)),
                          jnp.uint8),
        text_ids=jnp.asarray(r.integers(1, 100, (b, t)), jnp.int32),
        text_padding_mask=jnp.zeros((b, t), jnp.int32),
        img_shape=jnp.asarray([[img, img]] * b, jnp.int32),
    ))
    assert bool(jnp.isfinite(preds["token"]["best_box"]).all())
