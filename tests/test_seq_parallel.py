"""Sequence parallelism (BEiT3Config.seq_parallel) on the virtual
8-device mesh: the residual stream between TP matmul blocks is sharded
over ("model") along the sequence dim (Megatron-SP; _seq_shard in
models/beit3.py).  GSPMD guarantees numerics, so the tests assert
(a) exact agreement with the unsharded model and (b) that the
constraint actually lands in the compiled program's output shardings.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from simvg_tpu.engine import (
    create_optimizer,
    create_train_state,
    make_train_step,
)
from simvg_tpu.models import SimVGModel, SimVGConfig
from simvg_tpu.models.beit3 import BEiT3Config
from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig
from simvg_tpu.parallel import create_mesh, shard_params

from tests.test_train_step import BLW, _batch


def _model(seq_parallel, scan_layers=False):
    cfg = SimVGConfig(
        beit3=BEiT3Config(
            img_size=32, patch_size=16, embed_dim=32, num_heads=4,
            ffn_dim=64, num_layers=2, vocab_size=64, drop_path_rate=0.0,
            seq_parallel=seq_parallel, scan_layers=scan_layers,
        ),
        head=TGQSHeadConfig(
            num_queries=1, in_channels=32, embed_dim=32,
            num_decoder_layers=2, num_tgqg_layers=1,
            attn_dropout=0.0, ffn_dropout=0.0,
        ),
    )
    return SimVGModel(cfg)


def test_seq_parallel_matches_unsharded():
    """TP+SP train step over 4x2 == single-device step without SP
    (identical params/batch; SP is a layout annotation, not math)."""
    batch = _batch(8, seed=11)
    init_keys = {k: batch[k] for k in
                 ("image", "text_ids", "text_padding_mask", "img_shape")}
    base = _model(seq_parallel=False)
    params = base.init(jax.random.PRNGKey(0), **init_keys)
    tx = create_optimizer(1e-3, steps_per_epoch=1000)

    state1 = create_train_state(params, tx, ema=False)
    step1 = make_train_step(base, tx, branch_loss_weight=BLW,
                            ema_alpha=None)
    _, sc1 = jax.jit(step1)(state1, batch, jax.random.PRNGKey(2))

    sp = _model(seq_parallel=True)  # same param tree, extra constraints
    mesh = create_mesh(8, model_parallel=2)
    step2 = make_train_step(sp, tx, branch_loss_weight=BLW,
                            ema_alpha=None)
    with mesh:
        p2 = shard_params(params, mesh)
        state2 = create_train_state(p2, tx, ema=False)
        bsh = NamedSharding(mesh, P("data"))
        batch2 = {k: jax.device_put(v, bsh) for k, v in batch.items()}
        _, sc2 = jax.jit(step2)(state2, batch2, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(sc1["loss_total"]),
                               float(sc2["loss_total"]), rtol=1e-4)


def test_seq_parallel_scan_forward_and_constraint():
    """Scan layout + SP: forward equals the unsharded forward, and the
    encoder's residual stream is really model-sharded along S (checked
    on the jitted forward's internal sharding via the encoder output
    when the constraint is the last op of each layer)."""
    batch = _batch(8, seed=13)
    init_keys = {k: batch[k] for k in
                 ("image", "text_ids", "text_padding_mask", "img_shape")}
    base = _model(seq_parallel=False, scan_layers=True)
    params = base.init(jax.random.PRNGKey(0), **init_keys)
    out1 = jax.jit(lambda p, b: base.apply(
        p, **b, deterministic=True))(params, init_keys)

    sp = _model(seq_parallel=True, scan_layers=True)
    mesh = create_mesh(8, model_parallel=2)
    with mesh:
        p2 = shard_params(params, mesh)
        b2 = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
              for k, v in init_keys.items()}
        fn = jax.jit(lambda p, b: sp.apply(p, **b, deterministic=True))
        out2 = fn(p2, b2)

        # the helper really shards the sequence axis over "model"
        from simvg_tpu.models.beit3 import _seq_shard

        cfg_sp = sp.cfg.beit3
        probe = jax.jit(lambda x: _seq_shard(cfg_sp, (x, x))[0])
        y = probe(jax.device_put(jnp.zeros((8, 12, 32)),
                                 NamedSharding(mesh, P("data"))))
        # PartitionSpec normalizes away trailing Nones
        assert tuple(y.sharding.spec) == ("data", "model"), y.sharding

        # and the constraints survive into the SP model's lowered
        # program (absent from the same model without the flag)
        base_lowered = jax.jit(
            lambda p, b: _model(False, scan_layers=True).apply(
                p, **b, deterministic=True)).lower(p2, b2).as_text()
        sp_lowered = fn.lower(p2, b2).as_text()
        assert (sp_lowered.count("sharding")
                > base_lowered.count("sharding")), (
            sp_lowered.count("sharding"), base_lowered.count("sharding"))

    for a, b in zip(jax.tree_util.tree_leaves(out1),
                    jax.tree_util.tree_leaves(out2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
