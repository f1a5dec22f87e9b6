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


def test_device_norm_train_step_matches_host_norm():
    """uint8 batch + device_norm must give the same loss as a
    host-normalised float batch."""
    import optax

    from simvg_tpu.engine import (
        create_optimizer,
        create_train_state,
        make_train_step,
    )

    model, params, batch = _model_and_batch()
    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]
    r = np.random.default_rng(1)
    raw_u8 = r.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    host_norm = ((raw_u8[..., ::-1].astype(np.float32)
                  - np.asarray(mean, np.float32))
                 / np.asarray(std, np.float32))

    gt = dict(
        gt_boxes=jnp.asarray([[[4, 4, 20, 20]], [[2, 2, 16, 16]]],
                             jnp.float32),
        gt_labels=jnp.zeros((2, 1), jnp.int32),
        gt_valid=jnp.ones((2, 1), bool),
    )
    common = {k: batch[k] for k in ("text_ids", "text_padding_mask",
                                    "img_shape")}
    tx = create_optimizer(1e-3, steps_per_epoch=10, grad_norm_clip=0.0)

    def run(image, device_norm):
        step = make_train_step(
            model, tx,
            branch_loss_weight={"decoder": 1.0},
            ema_alpha=None, with_metrics=False,
            device_norm=device_norm,
        )
        state = create_train_state(params, tx, ema=False)
        _, sc = jax.jit(step)(
            state, {**common, **gt, "image": jnp.asarray(image)},
            jax.random.PRNGKey(0),
        )
        return float(sc["loss_total"])

    l_host = run(host_norm, None)
    l_dev = run(raw_u8, {"mean": mean, "std": std, "to_rgb": True})
    np.testing.assert_allclose(l_dev, l_host, rtol=1e-5)


def test_device_normalize_pad_region_matches_host():
    """normalize_on_device must feed the model the SAME pad pixels the
    host Normalize->Pad path produces (exact zeros), for images smaller
    than the canvas."""
    import numpy as np
    from simvg_tpu.data.prefetch import normalize_images_on_device

    rng = np.random.default_rng(0)
    canvas = 16
    u8 = np.zeros((2, canvas, canvas, 3), np.uint8)
    shapes = np.asarray([[10, 12], [16, 16]], np.int32)
    for i, (h, w) in enumerate(shapes):
        u8[i, :h, :w] = rng.integers(0, 255, (h, w, 3))
    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]
    out = np.asarray(normalize_images_on_device(
        jnp.asarray(u8), mean, std, to_rgb=True,
        img_shape=jnp.asarray(shapes)))
    # pad region is exactly zero (host path: normalize THEN pad with 0)
    assert np.all(out[0, 10:, :, :] == 0.0)
    assert np.all(out[0, :, 12:, :] == 0.0)
    # valid region matches host normalization
    want = (u8[0, :10, :12, ::-1].astype(np.float32)
            - np.asarray(mean)) / np.asarray(std)
    np.testing.assert_allclose(out[0, :10, :12], want, rtol=1e-5)


def test_shard_wrap_pad_batches_marked_invalid():
    """Cross-shard wrap-pad duplicates (equal SPMD step counts) must
    not count in metrics: their batch_valid is all False."""
    import numpy as np
    from simvg_tpu.data.loader import DataLoader

    class DS:
        flag = np.zeros(10, np.int64)

        def __len__(self):
            return 10

        def __getitem__(self, i):
            img = np.zeros((8, 8, 3), np.float32)
            return {
                "img": img, "img_shape": img.shape,
                "ori_shape": img.shape, "pad_shape": img.shape,
                "scale_factor": np.ones(4, np.float32),
                "ref_expr_inds": np.zeros(4, np.int32),
                "text_attention_mask": np.ones(4, np.int32),
                "gt_bbox": np.asarray([0, 0, 4, 4], np.float64),
                "with_bbox": True, "with_mask": False,
                "filename": f"f{i}", "expression": "x",
            }

    # 10 samples, bs=2 -> 5 batches; 4 shards -> pad to 8 (3 dup
    # batches); every shard yields 2 batches
    loaders = [DataLoader(DS(), batch_size=2, canvas=8, shuffle=False,
                          num_workers=1, shard_id=s, num_shards=4)
               for s in range(4)]
    counts = [len(l) for l in loaders]
    assert counts == [2, 2, 2, 2]
    valid_total = 0
    for l in loaders:
        for b in l:
            valid_total += int(np.asarray(b["batch_valid"]).sum())
    # exactly the 10 real samples count once; 3 dup batches invalid
    assert valid_total == 10, valid_total
