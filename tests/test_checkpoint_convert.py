"""Checkpoint-conversion parity.

Builds an INDEPENDENT torch implementation of the BEiT-3 multiway
encoder semantics (pre-LN, multiway A/B q/k/v/out + inner LN, subln FFN,
fairseq +2 positions, padded-embedding zeroing, fp32 softmax — written
here from the documented behaviour, not copied), exports its weights
under the reference's key naming (``beit3.encoder.layers.N...``), runs
tools/convert_checkpoint.convert_beit3_encoder, and checks our flax
encoder reproduces the torch outputs.  This is the guard that a real
released checkpoint will load correctly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder
from tools.convert_checkpoint import (
    convert_beit3_encoder,
    interpolate_pos_embed,
)


class TorchMultiway(nn.Module):
    def __init__(self, make):
        super().__init__()
        self.A = make()
        self.B = make()

    def forward(self, x, split):
        return torch.cat([self.A(x[:, :split]), self.B(x[:, split:])], 1)


class TorchFFN(nn.Module):
    def __init__(self, d, ffn_d):
        super().__init__()
        self.fc1 = nn.Linear(d, ffn_d)
        self.fc2 = nn.Linear(ffn_d, d)
        self.ffn_layernorm = nn.LayerNorm(ffn_d, eps=1e-5)

    def forward(self, x):
        return self.fc2(self.ffn_layernorm(F.gelu(self.fc1(x))))


class TorchLayer(nn.Module):
    def __init__(self, d, heads, ffn_d):
        super().__init__()
        self.d, self.h = d, heads
        mk = lambda: nn.Linear(d, d)
        self.self_attn = nn.Module()
        self.self_attn.q_proj = TorchMultiway(mk)
        self.self_attn.k_proj = TorchMultiway(mk)
        self.self_attn.v_proj = TorchMultiway(mk)
        self.self_attn.out_proj = TorchMultiway(mk)
        self.self_attn.inner_attn_ln = TorchMultiway(
            lambda: nn.LayerNorm(d, eps=1e-5))
        self.self_attn_layer_norm = TorchMultiway(
            lambda: nn.LayerNorm(d, eps=1e-5))
        self.ffn = TorchMultiway(lambda: TorchFFN(d, ffn_d))
        self.final_layer_norm = TorchMultiway(
            lambda: nn.LayerNorm(d, eps=1e-5))

    def attn(self, x, split, pad):
        b, s, d = x.shape
        hd = d // self.h
        q = self.self_attn.q_proj(x, split) * hd ** -0.5
        k = self.self_attn.k_proj(x, split)
        v = self.self_attn.v_proj(x, split)
        q = q.view(b, s, self.h, hd).transpose(1, 2)
        k = k.view(b, s, self.h, hd).transpose(1, 2)
        v = v.view(b, s, self.h, hd).transpose(1, 2)
        w = q @ k.transpose(-1, -2)
        w = w.masked_fill(pad[:, None, None, :].bool(), float("-inf"))
        w = F.softmax(w.float(), dim=-1).type_as(w)
        out = (w @ v).transpose(1, 2).reshape(b, s, d)
        out = self.self_attn.inner_attn_ln(out, split)
        return self.self_attn.out_proj(out, split)

    def forward(self, x, split, pad):
        res = x
        x = self.self_attn_layer_norm(x, split)
        x = res + self.attn(x, split, pad)
        res = x
        x = self.final_layer_norm(x, split)
        return res + self.ffn(x, split)


class TorchBeit3(nn.Module):
    def __init__(self, img=32, ps=16, d=32, heads=4, ffn_d=64, layers=2,
                 vocab=60, max_pos=64):
        super().__init__()
        self.ps = ps
        np_patches = (img // ps) ** 2
        self.split = np_patches + 1
        self.text_embed = nn.Embedding(vocab, d)
        ve = nn.Module()
        ve.proj = nn.Conv2d(3, d, ps, ps)
        ve.cls_token = nn.Parameter(torch.randn(1, 1, d))
        ve.mask_token = nn.Parameter(torch.randn(1, 1, d))
        self.vision_embed = ve
        enc = nn.Module()
        ep = nn.Module()
        ep.A = nn.Embedding(self.split + 2, d)
        ep.B = nn.Embedding(max_pos, d)
        enc.embed_positions = ep
        enc.layers = nn.ModuleList(
            [TorchLayer(d, heads, ffn_d) for _ in range(layers)]
        )
        enc.layer_norm = TorchMultiway(lambda: nn.LayerNorm(d, eps=1e-5))
        self.encoder = enc

    def forward(self, images_nchw, text_ids, text_pad):
        x1 = self.vision_embed.proj(images_nchw).flatten(2).transpose(1, 2)
        cls = self.vision_embed.cls_token.expand(x1.shape[0], -1, -1)
        x1 = torch.cat([cls, x1], 1)
        x2 = self.text_embed(text_ids)
        split = x1.shape[1]
        x1 = x1 + self.encoder.embed_positions.A(
            torch.arange(2, split + 2))
        x2 = x2 + self.encoder.embed_positions.B(
            torch.arange(2, x2.shape[1] + 2))
        x = torch.cat([x1, x2], 1)
        pad = torch.cat(
            [torch.zeros(x1.shape[:2]), text_pad.float()], 1
        )
        x = x * (1 - pad.unsqueeze(-1))
        for layer in self.encoder.layers:
            x = layer(x, split, pad)
        x = self.encoder.layer_norm(x, split)
        return x[:, 1:split], x[:, split:], x[:, 0]


def _export_torch_keys(model: TorchBeit3):
    sd = {}
    for k, v in model.state_dict().items():
        sd["beit3." + k] = v.detach().numpy()
    return sd


def test_encoder_parity_with_independent_torch_impl():
    torch.manual_seed(0)
    tm = TorchBeit3()
    cfg = BEiT3Config(img_size=32, patch_size=16, embed_dim=32,
                      num_heads=4, ffn_dim=64, num_layers=2, vocab_size=60,
                      max_source_positions=64, drop_path_rate=0.0)
    enc = BEiT3Encoder(cfg)
    b, t = 2, 6
    rng = np.random.default_rng(0)
    img = rng.normal(size=(b, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(0, 60, (b, t)).astype(np.int32)
    pad = np.zeros((b, t), np.int32)
    pad[:, 4:] = 1

    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(img),
                      jnp.asarray(ids), jnp.asarray(pad))
    params = jax.tree.map(np.asarray, params)
    params = jax.tree_util.tree_map(lambda x: x, params)

    # deep-copy into plain dicts for in-place conversion
    def deep(d):
        return {k: deep(v) for k, v in d.items()} if isinstance(
            d, dict) else d

    params = deep(params)
    sd = _export_torch_keys(tm)
    report = convert_beit3_encoder(sd, params, prefix="beit3.",
                                   out_prefix="")
    assert len(report) > 40

    with torch.no_grad():
        ti, tt, tc = tm(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(ids.astype(np.int64)),
            torch.from_numpy(pad.astype(np.int64)),
        )
    ji, jt, jc = enc.apply(params, jnp.asarray(img), jnp.asarray(ids),
                           jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(ji), ti.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jt), tt.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=2e-5)


def test_pos_embed_interpolation_shapes():
    w = np.random.default_rng(0).normal(size=(3 + 16, 8)).astype(
        np.float32)  # 4x4 grid + 3 extra
    out = interpolate_pos_embed(w, 3 + 64)  # -> 8x8 grid
    assert out.shape == (67, 8)
    np.testing.assert_allclose(out[:3], w[:3])
    # identity when already matching
    same = interpolate_pos_embed(w, w.shape[0])
    np.testing.assert_allclose(same, w)
