"""End-to-end converter gate on CHECKED-IN reference-format .pth files.

tests/fixtures/*.pth are miniature checkpoints in the reference's two
on-disk families (BEiT-3 pretrain {"model": {beit3.*}} and full SimVG
{"state_dict": {vis_enc.*, head.*}} with packed in_proj_weight). This
test runs file -> conversion -> orbax -> restore -> forward, exercising
BOTH interpolations (pos-embed 8x8 grid -> 4x4, patch proj 8 -> 16), so
the within-0.3 parity gate is one command once real weights mount.
"""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simvg_tpu.models import SimVGModel, SimVGConfig
from simvg_tpu.models.beit3 import BEiT3Config
from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
FIXTURES = osp.join(REPO, "tests", "fixtures")


def _tiny_cfg(scan=False):
    return SimVGConfig(
        beit3=BEiT3Config(img_size=64, patch_size=16, embed_dim=32,
                          num_heads=4, ffn_dim=64, num_layers=2,
                          vocab_size=80, drop_path_rate=0.0,
                          scan_layers=scan),
        head=TGQSHeadConfig(num_queries=2, in_channels=32, embed_dim=32,
                            num_decoder_layers=2, num_tgqg_layers=1),
    )


def _batch(b=2):
    r = np.random.default_rng(0)
    return dict(
        image=jnp.asarray(r.normal(size=(b, 64, 64, 3)), jnp.float32),
        text_ids=jnp.asarray(r.integers(1, 80, (b, 6)), jnp.int32),
        text_padding_mask=jnp.zeros((b, 6), jnp.int32),
        img_shape=jnp.full((b, 2), 64, jnp.int32),
    )


def test_beit3_pretrain_pth_cli_to_orbax_to_eval(tmp_path):
    """.pth (8x8 grid, patch-8) -> CLI -> orbax -> restore into a
    4x4-grid patch-16 model -> forward. Covers both interpolations."""
    out = tmp_path / "converted"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "tools/convert_checkpoint.py",
         osp.join(FIXTURES, "beit3_pretrain_tiny.pth"), str(out),
         "--img-size", "64", "--patch-size", "16",
         "--embed-dim", "32", "--num-heads", "4", "--ffn-dim", "64",
         "--num-layers", "2", "--vocab-size", "80",
         "--num-queries", "2", "--platform", "cpu"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert out.is_dir()

    # build the model EXACTLY as the CLI does, so trees match
    from simvg_tpu.models.builder import build_model

    model, _ = build_model(
        {"type": "MIXDETRMB",
         "vis_enc": {"vit_type": "base", "img_size": 64,
                     "patch_size": 16, "vocab_size": 80,
                     "embed_dim": 32, "num_heads": 4, "ffn_dim": 64,
                     "num_layers": 2},
         "head": {"num_queries": 2, "in_channels": 32,
                  "embed_dim": 32}},
        img_size=64,
    )
    batch = _batch()
    template = model.init(jax.random.PRNGKey(0), **batch)
    from simvg_tpu.utils.checkpoint import load_checkpoint

    ck = load_checkpoint(str(out), params_template=template)
    params = ck["params"]

    # interpolation happened: restored pos table is the 4x4 target shape
    # and is NOT all-equal to any 19 rows of the 67-row source
    vp = np.asarray(
        params["params"]["beit3"]["vision_pos_embed"]["embedding"])
    assert vp.shape[0] == 4 * 4 + 1 + 2
    tp = np.asarray(template["params"]["beit3"]["vision_pos_embed"]
                    ["embedding"])
    assert not np.allclose(vp, tp)  # not the random init

    out_f = model.apply(params, **batch, deterministic=True)
    for k in ("class_decoder", "bbox_decoder", "class_token",
              "bbox_token"):
        assert np.isfinite(np.asarray(out_f[k])).all(), k


@pytest.mark.parametrize("scan", [False, True])
def test_simvg_full_pth_restores_exact_params(scan):
    """Full-model .pth (reference key naming incl. in_proj_weight
    packing) restores bit-identical params, also into the scanned
    (stacked) layout."""
    from tools.convert_checkpoint import load_pretrained_into_params

    model = SimVGModel(_tiny_cfg(scan=scan))
    batch = _batch()
    # the fixture was generated from PRNGKey(1234) on the UNROLLED cfg
    ref_model = SimVGModel(_tiny_cfg(scan=False))
    expected = jax.tree.map(
        np.asarray, ref_model.init(jax.random.PRNGKey(1234), **batch))

    start = model.init(jax.random.PRNGKey(9), **batch)
    loaded = load_pretrained_into_params(
        start, osp.join(FIXTURES, "simvg_full_tiny.pth"))

    if scan:
        from tools.convert_checkpoint import unstack_scan_layers

        loaded = unstack_scan_layers(loaded)
    flat_e = jax.tree_util.tree_flatten_with_path(expected)[0]
    flat_l = {jax.tree_util.keystr(kp): v for kp, v in
              jax.tree_util.tree_flatten_with_path(loaded)[0]}
    for kp, ve in flat_e:
        key = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            flat_l[key], ve, atol=1e-6, err_msg=key)

    # and the restored model produces the same outputs as the source
    out_e = ref_model.apply(expected, **batch, deterministic=True)
    out_l = model.apply(
        jax.tree.map(jnp.asarray,
                     load_pretrained_into_params(
                         model.init(jax.random.PRNGKey(9), **batch),
                         osp.join(FIXTURES, "simvg_full_tiny.pth"))),
        **batch, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_l["bbox_decoder"]),
        np.asarray(out_e["bbox_decoder"]), atol=1e-5)
