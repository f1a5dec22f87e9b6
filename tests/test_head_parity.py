"""DETR decoder-layer parity vs an independent torch implementation.

Validates both the layer math (post-norm order, positional embeddings on
q/k only, identity residual) and the converter's detrex key mapping
(packed in_proj split, ffns/norms naming).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from simvg_tpu.models.heads.detr_transformer import DetrDecoderLayer
from tools.convert_checkpoint import _convert_detr_layer


class TorchDetrLayer(nn.Module):
    """detrex BaseTransformerLayer("self_attn","norm","cross_attn",
    "norm","ffn","norm") semantics, written from the spec."""

    def __init__(self, d=32, heads=4, ffd=64):
        super().__init__()
        self.attentions = nn.ModuleList()
        for _ in range(2):
            m = nn.Module()
            m.attn = nn.MultiheadAttention(d, heads, dropout=0.0,
                                           batch_first=True)
            self.attentions.append(m)
        ffn = nn.Module()
        ffn.layers = nn.ModuleList([
            nn.Sequential(nn.Linear(d, ffd), nn.ReLU(),
                          nn.Dropout(0.0)),
            nn.Linear(ffd, d),
        ])
        self.ffns = nn.ModuleList([ffn])
        self.norms = nn.ModuleList([nn.LayerNorm(d) for _ in range(3)])

    def forward(self, query, memory, query_pos, key_pos, key_pad):
        q = k = query + query_pos
        out, _ = self.attentions[0].attn(q, k, query, need_weights=False)
        x = self.norms[0](query + out)
        out, _ = self.attentions[1].attn(
            x + query_pos, memory + key_pos, memory,
            key_padding_mask=key_pad.bool(), need_weights=False)
        x = self.norms[1](x + out)
        h = self.ffns[0].layers[1](self.ffns[0].layers[0](x))
        return self.norms[2](x + h)


def _export(layer: TorchDetrLayer, prefix="layers.0."):
    sd = {}
    for k, v in layer.state_dict().items():
        sd[prefix + k] = v.detach().numpy()
    # our converter expects ffns.0.layers.0.0.* (Sequential index)
    return sd


def test_decoder_layer_parity():
    torch.manual_seed(0)
    tl = TorchDetrLayer()
    d, heads = 32, 4
    jl = DetrDecoderLayer(embed_dim=d, num_heads=heads,
                          feedforward_dim=64, attn_dropout=0.0,
                          ffn_dropout=0.0)
    b, q, s = 2, 3, 11
    r = np.random.default_rng(0)
    query = r.normal(size=(b, q, d)).astype(np.float32)
    memory = r.normal(size=(b, s, d)).astype(np.float32)
    qpos = r.normal(size=(b, q, d)).astype(np.float32)
    kpos = r.normal(size=(b, s, d)).astype(np.float32)
    kpad = np.zeros((b, s), np.int64)
    kpad[:, 8:] = 1

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
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)
