"""FSDP/ZeRO sharding on the virtual 8-device CPU mesh.

The reference's only parallelism is DDP (replicated optimizer state on
every GPU, /root/reference/tools/train.py:102-103).  The TPU-native
memory lever for pod-scale ViT-L training is ZeRO-style sharding of
params + grads + optimizer state + EMA over the *data* mesh axis
(``fsdp=True`` config key; parallel/mesh.py param_partition_spec):
XLA inserts the all-gather before each use and reduce-scatters the
gradient, so each chip stores 1/dp of every large state tensor.
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
from simvg_tpu.parallel import create_mesh, shard_params
from simvg_tpu.parallel.mesh import param_partition_spec

from tests.test_train_step import BLW, _batch, _tiny_model


def _scan_tiny_model():
    from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig

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
    return SimVGModel(cfg), cfg


def test_fsdp_spec_rules():
    mesh = create_mesh(8, model_parallel=2)  # data=4, model=2
    dp = mesh.shape["data"]

    # plain 2-D kernel: largest dp-divisible matrix dim gets "data"
    v = np.zeros((64, 32), np.float32)
    spec = param_partition_spec("head/mlp/kernel", v, mesh, fsdp=True,
                                fsdp_min_size=0)
    assert spec == P("data", None), spec

    # col-parallel TP kernel: "model" on out-features, fsdp composes on
    # the in-features dim
    v = np.zeros((32, 64), np.float32)
    spec = param_partition_spec("layers/ffn/fc1_A/kernel", v, mesh,
                                fsdp=True, fsdp_min_size=0)
    assert spec == P("data", "model"), spec

    # scan-stacked row-parallel kernel: leading [L] axis NEVER sharded
    v = np.zeros((2, 64, 32), np.float32)
    spec = param_partition_spec("layers/ffn/fc2_A/kernel", v, mesh,
                                fsdp=True, fsdp_min_size=0)
    assert spec == P(None, "model", "data"), spec

    # odd-vocab embedding: vocab not divisible by dp=4 -> feature dim
    v = np.zeros((65, 32), np.float32)
    spec = param_partition_spec("beit3/token_embed/embedding", v, mesh,
                                fsdp=True, fsdp_min_size=0)
    assert spec == P(None, "data"), spec

    # small leaves stay replicated at the default threshold
    v = np.zeros((64, 32), np.float32)
    spec = param_partition_spec("head/mlp/kernel", v, mesh, fsdp=True)
    assert spec == P(None, None), spec

    # 1-D (bias/LN) leaves are never fsdp-sharded
    v = np.zeros((1 << 20,), np.float32)
    spec = param_partition_spec("some/bias", v, mesh, fsdp=True)
    assert spec == P(None), spec


def test_fsdp_step_matches_single_device():
    """dp=8 fully-sharded step == unsharded step, and the optimizer
    state actually lives sharded (the ZeRO claim)."""
    model, _ = _tiny_model()
    batch = _batch(8, seed=7)
    init_keys = {k: batch[k] for k in
                 ("image", "text_ids", "text_padding_mask", "img_shape")}
    params = model.init(jax.random.PRNGKey(0), **init_keys)
    tx = create_optimizer(1e-3, steps_per_epoch=1000)
    step_fn = make_train_step(model, tx, branch_loss_weight=BLW,
                              ema_alpha=0.999)

    state1 = create_train_state(params, tx, ema=True)
    state1, sc1 = jax.jit(step_fn)(state1, batch, jax.random.PRNGKey(2))

    mesh = create_mesh(8, model_parallel=1)
    with mesh:
        p2 = shard_params(params, mesh, fsdp=True, fsdp_min_size=0)
        # a representative kernel is data-sharded: each device holds a
        # strictly smaller addressable shard
        fc1 = p2["params"]["beit3"]["layers_0"]["ffn"]["fc1_A"]["kernel"]
        assert "data" in str(fc1.sharding.spec), fc1.sharding
        shard = fc1.addressable_shards[0].data
        assert shard.size < fc1.size, (shard.shape, fc1.shape)

        state2 = create_train_state(p2, tx, ema=True)
        # optimizer state + EMA inherit the param placement (tx.init /
        # jnp.copy follow data): that is what makes this ZeRO, not
        # just sharded params
        opt_shardings = [x.sharding for x in
                         jax.tree_util.tree_leaves(state2.opt_state)
                         if hasattr(x, "sharding")]
        assert any("data" in str(s.spec) for s in opt_shardings
                   if hasattr(s, "spec")), opt_shardings[:4]
        ema_fc1 = (state2.ema_params["params"]["beit3"]["layers_0"]
                   ["ffn"]["fc1_A"]["kernel"])
        assert ema_fc1.sharding == fc1.sharding

        bsh = NamedSharding(mesh, P("data"))
        batch2 = {k: jax.device_put(v, bsh) for k, v in batch.items()}
        state2, sc2 = jax.jit(step_fn)(state2, batch2,
                                       jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(sc1["loss_total"]),
                               float(sc2["loss_total"]), rtol=1e-4)
    # updated params agree leaf-for-leaf, not just the scalar loss
    flat1 = jax.tree_util.tree_leaves(state1.params)
    flat2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


import pytest


@pytest.mark.slow
def test_fsdp_cli_train_and_resume(tmp_path):
    """E2E through tools/train.py with fsdp=True: one epoch trains with
    data-sharded params, and --auto-resume re-places the restored
    params AND optimizer state back onto the ZeRO layout (the
    opt_placements snapshot in tools/train.py)."""
    import json
    import os
    import subprocess
    import sys

    from tests.util_synth import make_refcoco_style

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    synth = tmp_path / "synth"
    make_refcoco_style(str(synth), n_train=8, n_val=4)
    work = tmp_path / "fsdp"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"

    def run(max_epoch):
        cmd = [
            sys.executable, "tools/train.py",
            "configs/smoke/tiny_synth.py",
            "--platform", "cpu", "--work-dir", str(work),
            "--auto-resume",
            "--cfg-options",
            "fsdp=True", "fsdp_min_size=0",
            "data.samples_per_gpu=1",
            f"scheduler_config.max_epoch={max_epoch}",
            "evaluate_interval=5",
            f"data.train.annsfile={synth}/instances.json",
            f"data.train.imgsfile={synth}/images",
            f"data.val.annsfile={synth}/instances.json",
            f"data.val.imgsfile={synth}/images",
        ]
        proc = subprocess.run(cmd, cwd=repo, env=env,
                              capture_output=True, text=True,
                              timeout=900)
        assert proc.returncode == 0, proc.stderr[-3000:]

    run(max_epoch=1)
    logs = [f for f in os.listdir(work) if f.endswith("_train_log.txt")]
    text = open(os.path.join(work, logs[0])).read()
    assert "fsdp" in text, text[:2000]
    # second invocation resumes from the epoch-1 latest checkpoint and
    # runs epoch 2 through the restored+re-placed (ZeRO) state
    run(max_epoch=2)
    metrics = [json.loads(line) for line in
               open(os.path.join(work, "metrics.jsonl"))]
    train = [m for m in metrics if m.get("kind") == "train"]
    assert {m["epoch"] for m in train} >= {1, 2}
    assert all(np.isfinite(m["loss_total"]) for m in train)


def test_fsdp_composes_with_tp_scan():
    """4x2 mesh, scan layout: [L, data|model, model|data] kernels give
    the same loss as single-device."""
    model, _ = _scan_tiny_model()
    batch = _batch(8, seed=9)
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
        p2 = shard_params(params, mesh, fsdp=True, fsdp_min_size=0)
        fc1 = p2["params"]["beit3"]["layers"]["ffn"]["fc1_A"]["kernel"]
        assert fc1.ndim == 3
        s = str(fc1.sharding.spec)
        assert "data" in s and "model" in s, s
        state2 = create_train_state(p2, tx, ema=False)
        bsh = NamedSharding(mesh, P("data"))
        batch2 = {k: jax.device_put(v, bsh) for k, v in batch.items()}
        _, sc2 = jax.jit(step_fn)(state2, batch2, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(sc1["loss_total"]),
                               float(sc2["loss_total"]), rtol=1e-4)
