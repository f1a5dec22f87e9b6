import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.data.prefetch import (
    device_prefetch,
    normalize_images_on_device,
)
from simvg_tpu.models import SimVGModel, SimVGConfig
from simvg_tpu.models.beit3 import BEiT3Config
from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig


def _model_and_batch():
    cfg = SimVGConfig(
        beit3=BEiT3Config(img_size=32, patch_size=16, embed_dim=32,
                          num_heads=4, ffn_dim=64, num_layers=1,
                          vocab_size=60, drop_path_rate=0.0),
        head=TGQSHeadConfig(num_queries=1, in_channels=32, embed_dim=32,
                            num_decoder_layers=2, num_tgqg_layers=1,
                            attn_dropout=0.0, ffn_dropout=0.0),
    )
    model = SimVGModel(cfg)
    r = np.random.default_rng(0)
    batch = dict(
        image=jnp.asarray(r.normal(size=(2, 32, 32, 3)), jnp.float32),
        text_ids=jnp.asarray(r.integers(1, 60, (2, 5)), jnp.int32),
        text_padding_mask=jnp.zeros((2, 5), jnp.int32),
        img_shape=jnp.full((2, 2), 32, jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)
    return model, params, batch


def test_token_branch_only_matches_both():
    model, params, batch = _model_and_batch()
    both = model.apply(params, **batch, branches="both")
    tok = model.apply(params, **batch, branches="token")
    np.testing.assert_allclose(np.asarray(tok["class_token"]),
                               np.asarray(both["class_token"]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(tok["bbox_token"]),
                               np.asarray(both["bbox_token"]),
                               atol=1e-6)
    dec = model.apply(params, **batch, branches="decoder")
    np.testing.assert_allclose(np.asarray(dec["bbox_decoder"]),
                               np.asarray(both["bbox_decoder"]),
                               atol=1e-6)


def test_device_prefetch_order_and_meta():
    batches = [
        {"x": np.full((2,), i, np.float32), "meta": [f"m{i}"]}
        for i in range(5)
    ]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["x"][0]) == i
        assert b["meta"] == [f"m{i}"]
        assert isinstance(b["x"], jax.Array)


def test_normalize_on_device_matches_host():
    from simvg_tpu.data.transforms import Normalize

    r = np.random.default_rng(0)
    img = r.integers(0, 255, (8, 8, 3), np.uint8)
    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]
    host = Normalize(mean, std)(
        {"img": img.copy(), "img_norm_cfg": None}
    )["img"]
    dev = normalize_images_on_device(jnp.asarray(img[None]), mean, std)
    np.testing.assert_allclose(np.asarray(dev[0]), host, atol=1e-4)
