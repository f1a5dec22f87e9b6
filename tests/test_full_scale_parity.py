"""Full-flagship-scale torch<->JAX parity (VERDICT r2 next-round #1).

The miniature parity tests (test_checkpoint_convert, test_head_parity)
run at 8x8 grids / dim 32; this file runs the SAME independent-torch
oracles at the shipped config's REAL dimensions, exercising the real
interpolation ratios the released-weight load will hit:

- BEiT3-base: 768 dim, 12 heads, 3072 ffn, 12 multiway layers,
  vocab 64010;
- checkpoint geometry 224/16 (14x14 grid, 199-row torchscale position
  table) -> target geometry 640/32 (20x20 grid, 403 rows): the
  14^2 -> 20^2 bicubic pos-embed interpolation and the 16x16 -> 32x32
  patch-proj interpolation of the reference's
  load_model_and_may_interpolate
  (/root/reference/simvg/models/vis_encs/beit/beit3.py:115-172);
- DETR decoder layer at the flagship head dims (256 dim, 8 heads,
  2048 ffn, 400-token memory).

The torch oracle interpolates with an independent in-test
implementation of the reference semantics and loads the result into a
torch model at 640/32; our converter receives the RAW 224/16 state
dict and must land on the same outputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder  # noqa: E402
from tools.convert_checkpoint import convert_beit3_encoder  # noqa: E402

from test_checkpoint_convert import TorchBeit3, _export_torch_keys  # noqa: E402


def _reference_interpolate_sd(sd, d, new_grid, new_ps):
    """Reference load_model_and_may_interpolate semantics
    (beit3.py:115-172), written independently for the oracle:
    torchscale branch — num_extra = (num_patches+1) + 2 - num_patches
    = 3 rows kept, grid bicubic align_corners=False; proj kernel
    bicubic to the new patch size."""
    sd = dict(sd)
    pos = torch.from_numpy(sd["beit3.encoder.embed_positions.A.weight"])
    num_extra = 3
    extra = pos[:num_extra].unsqueeze(0)
    pt = pos[num_extra:]
    orig = int(pt.shape[0] ** 0.5)
    assert orig * orig == pt.shape[0]
    pt = pt.reshape(-1, orig, orig, d).permute(0, 3, 1, 2).float()
    pt = F.interpolate(pt, size=(new_grid, new_grid), mode="bicubic",
                       align_corners=False)
    pt = pt.permute(0, 2, 3, 1).flatten(1, 2)
    sd["beit3.encoder.embed_positions.A.weight"] = torch.cat(
        (extra, pt), dim=1).squeeze(0).numpy()

    proj = torch.from_numpy(sd["beit3.vision_embed.proj.weight"]).float()
    proj = F.interpolate(proj, size=(new_ps, new_ps), mode="bicubic",
                         align_corners=False)
    sd["beit3.vision_embed.proj.weight"] = proj.numpy()
    return sd


@pytest.mark.slow
@pytest.mark.parametrize(
    "d,heads,ffn,layers,b,tol",
    [
        pytest.param(768, 12, 3072, 12, 2, 5e-4, id="base32_640"),
        # ViT-L/32 (VERDICT r4 #3): the model-zoo accuracy numbers are
        # all L/32 (/root/reference/README.md:195-233, _get_large_config
        # modeling_utils.py:40-70) — the 24-layer/1024-dim conversion
        # with the same 14^2->20^2 + 16->32 interpolations must be
        # cross-checked at scale before the released-weight parity gate
        # runs it.  b=1 keeps the 0.67B-param dual-framework forward
        # inside the 1-core box's patience.
        pytest.param(1024, 16, 4096, 24, 1, 1e-3, id="large32_640"),
    ])
def test_full_scale_encoder_parity(d, heads, ffn, layers, b, tol):
    vocab = 64010
    torch.manual_seed(0)
    # checkpoint-geometry torch model: 224/16 -> 14x14 grid, 199-row
    # position table (the released beit3_base_patch16_224 layout)
    tm16 = TorchBeit3(img=224, ps=16, d=d, heads=heads, ffn_d=ffn,
                      layers=layers, vocab=vocab, max_pos=64)
    sd_raw = _export_torch_keys(tm16)
    assert sd_raw["beit3.encoder.embed_positions.A.weight"].shape == \
        (3 + 14 * 14, d)
    assert sd_raw["beit3.vision_embed.proj.weight"].shape == \
        (d, 3, 16, 16)

    # oracle: reference-semantics interpolation -> torch model @640/32
    sd32 = _reference_interpolate_sd(sd_raw, d, new_grid=20, new_ps=32)
    tm32 = TorchBeit3(img=640, ps=32, d=d, heads=heads, ffn_d=ffn,
                      layers=layers, vocab=vocab, max_pos=64)
    tm32.load_state_dict(
        {k[len("beit3."):]: torch.from_numpy(np.asarray(v))
         for k, v in sd32.items()})
    tm32.eval()

    # ours: converter gets the RAW 224/16 state dict and interpolates
    # internally on shape mismatch
    cfg = BEiT3Config(img_size=640, patch_size=32, embed_dim=d,
                      num_heads=heads, ffn_dim=ffn, num_layers=layers,
                      vocab_size=vocab, max_source_positions=64,
                      drop_path_rate=0.0)
    enc = BEiT3Encoder(cfg)
    t = 20
    rng = np.random.default_rng(0)
    img = rng.normal(size=(b, 640, 640, 3)).astype(np.float32)
    ids = rng.integers(0, vocab, (b, t)).astype(np.int32)
    pad = np.zeros((b, t), np.int32)
    pad[0, 12:] = 1
    if b > 1:
        pad[1, 7:] = 1

    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(img),
                      jnp.asarray(ids), jnp.asarray(pad))

    def deep(x):
        return {k: deep(v) for k, v in x.items()} if isinstance(
            x, dict) else np.asarray(x)

    params = deep(params)
    report = convert_beit3_encoder(sd_raw, params, prefix="beit3.",
                                   out_prefix="")
    # 5 embedding tensors + 12 layers x 26 multiway tensors + 4 final LN
    assert len(report) >= 5 + layers * 26 + 4

    with torch.no_grad():
        ti, tt, tc = tm32(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(ids.astype(np.int64)),
            torch.from_numpy(pad.astype(np.int64)),
        )
    ji, jt, jc = enc.apply(params, jnp.asarray(img), jnp.asarray(ids),
                           jnp.asarray(pad))

    # fp32 through 12/24 layers: allow accumulation-order noise
    for ours, ref, name in ((ji, ti, "img"), (jt, tt, "text"),
                            (jc, tc, "cls")):
        ref = ref.numpy()
        np.testing.assert_allclose(
            np.asarray(ours), ref, atol=tol, rtol=1e-3,
            err_msg=f"{name} features diverge at full scale")
    # and they must be far from the random-init params (sanity that the
    # conversion actually landed)
    assert float(np.abs(np.asarray(ji)).mean()) > 1e-3


@pytest.mark.slow
def test_decoder_layer_parity_flagship_dims():
    """Head decoder layer at the shipped dims (embed 256, 8 heads,
    ffn 2048, 20x20=400-token memory + padding)."""
    from test_head_parity import TorchDetrLayer, _export
    from simvg_tpu.models.heads.detr_transformer import DetrDecoderLayer
    from tools.convert_checkpoint import _convert_detr_layer

    d, heads, ffd = 256, 8, 2048
    torch.manual_seed(1)
    tl = TorchDetrLayer(d=d, heads=heads, ffd=ffd).eval()
    jl = DetrDecoderLayer(embed_dim=d, num_heads=heads,
                          feedforward_dim=ffd, attn_dropout=0.0,
                          ffn_dropout=0.0)
    b, q, s = 2, 10, 400
    r = np.random.default_rng(1)
    query = r.normal(size=(b, q, d)).astype(np.float32)
    memory = r.normal(size=(b, s, d)).astype(np.float32)
    qpos = r.normal(size=(b, q, d)).astype(np.float32)
    kpos = r.normal(size=(b, s, d)).astype(np.float32)
    kpad = np.zeros((b, s), np.int64)
    kpad[:, 380:] = 1

    params = jl.init(jax.random.PRNGKey(0), jnp.asarray(query),
                     jnp.asarray(memory), jnp.asarray(qpos),
                     jnp.asarray(kpos), jnp.asarray(kpad), True)

    def deep(x):
        return {k: deep(v) for k, v in x.items()} if isinstance(
            x, dict) else np.asarray(x)

    params = deep(params)
    sd = _export(tl)
    report = []
    _convert_detr_layer(sd, params, "layers.0.", "", report,
                        has_cross=True)
    assert len(report) >= 20

    with torch.no_grad():
        ref = tl(torch.from_numpy(query), torch.from_numpy(memory),
                 torch.from_numpy(qpos), torch.from_numpy(kpos),
                 torch.from_numpy(kpad)).numpy()
    ours = jl.apply(params, jnp.asarray(query), jnp.asarray(memory),
                    jnp.asarray(qpos), jnp.asarray(kpos),
                    jnp.asarray(kpad), True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4,
                               rtol=1e-4)
