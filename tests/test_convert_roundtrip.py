"""Full-model converter bijectivity: flax params -> reference-named torch
state dict (export_simvg_full) -> flax params (convert_simvg_full) must
be the identity.  Catches any transpose/naming drift between the two
directions and exercises every head submodule mapping."""

import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.models import SimVGModel, SimVGConfig
from simvg_tpu.models.beit3 import BEiT3Config
from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig
from tools.convert_checkpoint import (
    convert_simvg_full,
    export_simvg_full,
)


def _deep(d):
    return {k: _deep(v) for k, v in d.items()} if isinstance(
        d, dict) else np.asarray(d)


def test_export_convert_roundtrip():
    cfg = SimVGConfig(
        beit3=BEiT3Config(img_size=64, patch_size=16, embed_dim=32,
                          num_heads=4, ffn_dim=64, num_layers=2,
                          vocab_size=80, drop_path_rate=0.0),
        head=TGQSHeadConfig(num_queries=2, in_channels=32, embed_dim=32,
                            num_decoder_layers=2, num_tgqg_layers=1),
    )
    model = SimVGModel(cfg)
    b, t = 1, 6
    batch = dict(
        image=jnp.zeros((b, 64, 64, 3)),
        text_ids=jnp.zeros((b, t), jnp.int32),
        text_padding_mask=jnp.zeros((b, t), jnp.int32),
        img_shape=jnp.full((b, 2), 64, jnp.int32),
    )
    params = _deep(model.init(jax.random.PRNGKey(0), **batch))

    sd = export_simvg_full(params)
    assert any(k.startswith("vis_enc.beit3.encoder.layers.0") for k in sd)
    assert "head.transformer.decoder.layers.0.attentions.0.attn." \
        "in_proj_weight" in sd
    assert "head.query_embed.weight" in sd

    # perturb a copy, then restore from sd -> must equal the original
    perturbed = jax.tree.map(lambda x: x + 1.0, params)
    perturbed = _deep(perturbed)
    report = convert_simvg_full(sd, perturbed)
    assert len(report) > 100

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(perturbed)[0]
    restored, missed = 0, []
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        if np.allclose(va, vb, atol=1e-6):
            restored += 1
        else:
            missed.append(jax.tree_util.keystr(ka))
    # everything except genuinely-untrained leaves must round-trip
    assert not missed, missed[:10]
    assert restored == len(flat_a)
