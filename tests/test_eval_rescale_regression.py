"""Regression: eval metrics must be computed in RESIZED image scale.

The reference evaluates with rescale=False — predictions and GT both in
resized-image coordinates (/root/reference/simvg/apis/test.py:207).
Round-1 bug: make_eval_step rescaled predictions back to the ORIGINAL
image (dividing by scale_factor) while evaluate() compared against GT in
resized scale, so Prec@0.5 read ~0% whenever scale_factor != 1 (i.e. on
any real dataset). This test overfits a tiny model on non-square images
with scale_factor=2 and asserts the eval loop reports the overfit
accuracy; under the bug it reads ~0%.
"""

import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.engine import (
    create_optimizer,
    create_train_state,
    make_train_step,
)
from simvg_tpu.engine.evaluate import evaluate
from simvg_tpu.models import SimVGModel, SimVGConfig
from simvg_tpu.models.beit3 import BEiT3Config
from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig


class FakeLoader:
    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def test_eval_accuracy_survives_nonunit_scale_factor():
    # square canvas (the pipeline resizes keep_ratio=False to img_size²,
    # like the reference's Resize to 640²), but the ORIGINAL images are
    # non-square: anisotropic, non-unit scale_factor.
    h = w = 32
    model = SimVGModel(SimVGConfig(
        beit3=BEiT3Config(img_size=32, patch_size=16, embed_dim=32,
                          num_heads=4, ffn_dim=64, num_layers=1,
                          vocab_size=64, drop_path_rate=0.0),
        head=TGQSHeadConfig(num_queries=1, in_channels=32, embed_dim=32,
                            num_decoder_layers=1, num_tgqg_layers=1,
                            attn_dropout=0.0, ffn_dropout=0.0),
    ))

    b = 4
    r = np.random.default_rng(0)
    xy = r.uniform(2, 10, (b, 1, 2))
    wh = r.uniform(16, 24, (b, 1, 2))
    gt = np.concatenate([xy, np.minimum(xy + wh, [w - 1, h - 1])],
                        -1).astype(np.float32)
    batch = dict(
        image=jnp.asarray(r.normal(size=(b, h, w, 3)), jnp.float32),
        text_ids=jnp.asarray(r.integers(1, 64, (b, 6)), jnp.int32),
        text_padding_mask=jnp.zeros((b, 6), jnp.int32),
        img_shape=jnp.asarray(np.tile([[h, w]], (b, 1)), jnp.int32),
        gt_boxes=jnp.asarray(gt),
        gt_labels=jnp.zeros((b, 1), jnp.int32),
        gt_valid=jnp.ones((b, 1), bool),
    )

    params = model.init(
        jax.random.PRNGKey(0),
        **{k: batch[k] for k in
           ("image", "text_ids", "text_padding_mask", "img_shape")},
    )
    tx = create_optimizer(2e-3, steps_per_epoch=10_000)
    state = create_train_state(params, tx, ema=False)
    step = jax.jit(make_train_step(
        model, tx,
        branch_loss_weight={"decoder": 1.0,
                            "balanced_distill": {"token": 2.0,
                                                 "distill": 1.0}},
        ema_alpha=None,
    ))
    k = jax.random.PRNGKey(1)
    for _ in range(120):
        state, sc = step(state, batch, k)
    # sanity: the model actually overfit in train metrics
    assert float(sc["decoder_det_acc"]) >= 75.0, sc["decoder_det_acc"]

    # eval batch: images were "resized" from a smaller original by 2x,
    # so scale_factor=2 everywhere; GT stays in resized scale (that is
    # what the data pipeline produces).
    eval_batch = dict(batch)
    # original image was 16x24 -> resized 32x32: sf = (w2, h4/3, ...)
    eval_batch["scale_factor"] = np.tile(
        np.asarray([[2.0, 4.0 / 3.0, 2.0, 4.0 / 3.0]], np.float32),
        (b, 1),
    )
    eval_batch["batch_valid"] = np.ones(b, bool)
    eval_batch["meta"] = [{} for _ in range(b)]

    m = evaluate(model, state.params, FakeLoader([eval_batch]))
    # with the rescale bug this reads ~0 (boxes shrunk 2x vs GT)
    assert m["decoder_det_acc"] >= 75.0, m
