"""Train-step integration tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from simvg_tpu.engine import (
    create_optimizer,
    create_train_state,
    make_train_step,
)
from simvg_tpu.engine.train_state import multistep_lr_warmup
from simvg_tpu.models import SimVGModel, SimVGConfig
from simvg_tpu.models.beit3 import BEiT3Config
from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig
from simvg_tpu.parallel import create_mesh, shard_params


def _tiny_model():
    cfg = SimVGConfig(
        beit3=BEiT3Config(
            img_size=32, patch_size=16, embed_dim=32, num_heads=4,
            ffn_dim=64, num_layers=2, vocab_size=64, drop_path_rate=0.0,
        ),
        head=TGQSHeadConfig(
            num_queries=1, in_channels=32, embed_dim=32,
            num_decoder_layers=2, num_tgqg_layers=1,
            attn_dropout=0.0, ffn_dropout=0.0,
        ),
    )
    return SimVGModel(cfg), cfg


def _batch(b, img=32, t=6, seed=0):
    r = np.random.default_rng(seed)
    xy = r.uniform(2, 12, (b, 1, 2))
    wh = r.uniform(4, 12, (b, 1, 2))
    return dict(
        image=jnp.asarray(r.normal(size=(b, img, img, 3)), jnp.float32),
        text_ids=jnp.asarray(r.integers(1, 64, (b, t)), jnp.int32),
        text_padding_mask=jnp.zeros((b, t), jnp.int32).at[:, 4:].set(1),
        img_shape=jnp.full((b, 2), img, jnp.int32),
        gt_boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1),
                             jnp.float32),
        gt_labels=jnp.zeros((b, 1), jnp.int32),
        gt_valid=jnp.ones((b, 1), bool),
    )


BLW = {"decoder": 1.0, "balanced_distill": {"token": 2.0, "distill": 1.0}}


def test_loss_decreases_overfit():
    model, _ = _tiny_model()
    batch = _batch(4)
    params = model.init(
        jax.random.PRNGKey(0),
        **{k: batch[k] for k in
           ("image", "text_ids", "text_padding_mask", "img_shape")},
    )
    tx = create_optimizer(1e-3, steps_per_epoch=1000)
    state = create_train_state(params, tx, ema=True)
    step = jax.jit(
        make_train_step(model, tx, branch_loss_weight=BLW, ema_alpha=0.999)
    )
    k = jax.random.PRNGKey(1)
    first = None
    for i in range(30):
        state, sc = step(state, batch, k)
        if first is None:
            first = float(sc["loss_total"])
    last = float(sc["loss_total"])
    assert np.isfinite(last)
    assert last < first * 0.5, (first, last)
    # EMA shadow moved toward params but is distinct
    d = jax.tree.leaves(
        jax.tree.map(lambda a, b: jnp.abs(a - b).max(), state.params,
                     state.ema_params)
    )
    assert float(max(d)) > 0


def test_sharded_step_matches_single_device():
    """DP+TP sharded step must give the same loss as unsharded."""
    model, _ = _tiny_model()
    batch = _batch(8, seed=3)
    init_keys = {k: batch[k] for k in
                 ("image", "text_ids", "text_padding_mask", "img_shape")}
    params = model.init(jax.random.PRNGKey(0), **init_keys)
    tx = create_optimizer(1e-3, steps_per_epoch=1000)

    step_fn = make_train_step(model, tx, branch_loss_weight=BLW,
                              ema_alpha=None)

    # single device
    state1 = create_train_state(params, tx, ema=False)
    _, sc1 = jax.jit(step_fn)(state1, batch, jax.random.PRNGKey(2))

    # 4x2 mesh
    mesh = create_mesh(8, model_parallel=2)
    with mesh:
        p2 = shard_params(params, mesh)
        state2 = create_train_state(p2, tx, ema=False)
        bsh = NamedSharding(mesh, P("data"))
        batch2 = {k: jax.device_put(v, bsh) for k, v in batch.items()}
        _, sc2 = jax.jit(step_fn)(state2, batch2, jax.random.PRNGKey(2))

    np.testing.assert_allclose(
        float(sc1["loss_total"]), float(sc2["loss_total"]), rtol=1e-4
    )


def test_multistep_lr_warmup_schedule():
    """Matches the reference factor table (scheduler.py:24-38):
    warmup 3 epochs -> (e+1)/4; decay x0.1 from epoch index 24
    (epoch+1 >= 25)."""
    sched = multistep_lr_warmup(1.0, steps_per_epoch=10, warmup_epochs=3,
                                decay_steps=(25,), decay_ratio=0.1)
    def at_epoch(e):
        return float(sched(jnp.asarray(e * 10)))
    np.testing.assert_allclose(at_epoch(0), 1 / 4)
    np.testing.assert_allclose(at_epoch(1), 2 / 4)
    np.testing.assert_allclose(at_epoch(2), 3 / 4)
    np.testing.assert_allclose(at_epoch(3), 1.0)
    np.testing.assert_allclose(at_epoch(23), 1.0)
    np.testing.assert_allclose(at_epoch(24), 0.1)
    np.testing.assert_allclose(at_epoch(29), 0.1)


def test_cosine_annealing_is_periodic_past_tmax():
    """torch CosineAnnealingLR keeps following the cosine past T_max
    (the LR climbs back up); clamping at T_max silently diverged from
    the reference for runs longer than T_max (round-3 review)."""
    from simvg_tpu.engine.train_state import cosine_annealing_lr

    sched = cosine_annealing_lr(1.0, steps_per_epoch=10, t_max=10,
                                eta_min=0.0)
    at = lambda e: float(sched(jnp.asarray(e * 10)))  # noqa: E731
    np.testing.assert_allclose(at(0), 1.0)
    np.testing.assert_allclose(at(10), 0.0, atol=1e-7)  # trough at T_max
    np.testing.assert_allclose(at(20), 1.0)  # back at the crest
    assert at(15) > 0.4  # climbing, not pinned at eta_min


def test_sharded_step_with_scanned_encoder():
    """TP sharding must apply to the scan layout's stacked kernels and
    give the same loss as single-device."""
    from tools.convert_checkpoint import stack_scan_layers

    cfg = SimVGConfig(
        beit3=BEiT3Config(
            img_size=32, patch_size=16, embed_dim=32, num_heads=4,
            ffn_dim=64, num_layers=2, vocab_size=64, drop_path_rate=0.0,
            scan_layers=True,
        ),
        head=TGQSHeadConfig(
            num_queries=1, in_channels=32, embed_dim=32,
            num_decoder_layers=2, num_tgqg_layers=1,
            attn_dropout=0.0, ffn_dropout=0.0,
        ),
    )
    model = SimVGModel(cfg)
    batch = _batch(8, seed=5)
    init_keys = {k: batch[k] for k in
                 ("image", "text_ids", "text_padding_mask", "img_shape")}
    params = model.init(jax.random.PRNGKey(0), **init_keys)
    tx = create_optimizer(1e-3, steps_per_epoch=1000)
    step_fn = make_train_step(model, tx, branch_loss_weight=BLW,
                              ema_alpha=None)

    state1 = create_train_state(params, tx, ema=False)
    _, sc1 = jax.jit(step_fn)(state1, batch, jax.random.PRNGKey(2))

    mesh = create_mesh(8, model_parallel=2)
    with mesh:
        p2 = shard_params(params, mesh)
        # stacked scan kernels must actually be model-sharded
        from simvg_tpu.parallel.mesh import param_sharding

        fc1 = p2["params"]["beit3"]["layers"]["ffn"]["fc1_A"]["kernel"]
        assert fc1.ndim == 3
        spec = fc1.sharding.spec
        assert "model" in str(spec), spec
        state2 = create_train_state(p2, tx, ema=False)
        bsh = NamedSharding(mesh, P("data"))
        batch2 = {k: jax.device_put(v, bsh) for k, v in batch.items()}
        _, sc2 = jax.jit(step_fn)(state2, batch2, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(sc1["loss_total"]),
                               float(sc2["loss_total"]), rtol=1e-4)
