"""Worker for the 2-process multi-host test (spawned by
test_multihost.py). Exercises the tools/train.py multi-host contract:
jax.distributed init -> global mesh -> make_array_from_process_local_data
batch assembly -> one sharded train step -> evaluate() with local-shard
metric extraction + cross-process aggregation."""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2"
    # don't let XLA:CPU's 40s rendezvous abort kill a starved worker
    # on the 1-core CI box (see tests/conftest.py)
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
    " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from simvg_tpu.engine import (  # noqa: E402
    create_optimizer,
    create_train_state,
    make_train_step,
)
from simvg_tpu.engine.evaluate import evaluate  # noqa: E402
from simvg_tpu.engine.train import make_eval_step  # noqa: E402
from simvg_tpu.models import SimVGModel, SimVGConfig  # noqa: E402
from simvg_tpu.models.beit3 import BEiT3Config  # noqa: E402
from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig  # noqa: E402
from simvg_tpu.parallel import create_mesh  # noqa: E402

assert jax.device_count() == 2 * nproc
assert jax.local_device_count() == 2

mesh = create_mesh()  # all 4 devices, pure DP
bsh = NamedSharding(mesh, P("data"))

model = SimVGModel(SimVGConfig(
    beit3=BEiT3Config(img_size=32, patch_size=16, embed_dim=32,
                      num_heads=4, ffn_dim=64, num_layers=1,
                      vocab_size=64, drop_path_rate=0.0),
    head=TGQSHeadConfig(num_queries=1, in_channels=32, embed_dim=32,
                        num_decoder_layers=1, num_tgqg_layers=1,
                        attn_dropout=0.0, ffn_dropout=0.0),
))

# deterministic GLOBAL batch; each process contributes its half
GB = 8
r = np.random.default_rng(0)
xy = r.uniform(2, 12, (GB, 1, 2))
wh = r.uniform(8, 14, (GB, 1, 2))
global_batch = dict(
    image=np.asarray(r.normal(size=(GB, 32, 32, 3)), np.float32),
    text_ids=np.asarray(r.integers(1, 64, (GB, 6)), np.int32),
    text_padding_mask=np.zeros((GB, 6), np.int32),
    img_shape=np.full((GB, 2), 32, np.int32),
    gt_boxes=np.concatenate([xy, xy + wh], -1).astype(np.float32),
    gt_labels=np.zeros((GB, 1), np.int32),
    gt_valid=np.ones((GB, 1), bool),
)
lo, hi = pid * GB // nproc, (pid + 1) * GB // nproc
local = {k: v[lo:hi] for k, v in global_batch.items()}


def to_global(batch):
    """tools/train.py multi-host assembly."""
    return {k: jax.make_array_from_process_local_data(
        bsh, np.asarray(v), (v.shape[0] * nproc,) + v.shape[1:])
        for k, v in batch.items() if k != "meta"}


params = model.init(
    jax.random.PRNGKey(0),
    **{k: jnp.asarray(global_batch[k]) for k in
       ("image", "text_ids", "text_padding_mask", "img_shape")})
params = jax.device_put(params, NamedSharding(mesh, P()))

# FSDP leg prepared BEFORE the DP step (donation invalidates params):
# ZeRO state sharded over the CROSS-PROCESS data axis — each process
# holds only its slice of every kernel
from simvg_tpu.parallel import shard_params  # noqa: E402

p_fsdp = shard_params(params, mesh, fsdp=True, fsdp_min_size=0)
fc1 = p_fsdp["params"]["beit3"]["layers_0"]["ffn"]["fc1_A"]["kernel"]
assert "data" in str(fc1.sharding.spec), fc1.sharding
local_elems = sum(s.data.size for s in fc1.addressable_shards)
assert local_elems == fc1.size // nproc, (local_elems, fc1.size)

tx = create_optimizer(1e-3, steps_per_epoch=100)
state = create_train_state(params, tx)
state_f = create_train_state(p_fsdp, tx)
step = jax.jit(make_train_step(
    model, tx,
    branch_loss_weight={"decoder": 1.0,
                        "balanced_distill": {"token": 2.0,
                                             "distill": 1.0}},
    ema_alpha=None, dp_size=mesh.shape["data"]), donate_argnums=(0,))

state, scalars = step(state, to_global(local), jax.random.PRNGKey(1))
print(f"RESULT loss_total {float(scalars['loss_total']):.6f}", flush=True)

# identical init + batch through the ZeRO layout must give the DP loss
state_f, scalars_f = step(state_f, to_global(local), jax.random.PRNGKey(1))
print(f"RESULT loss_total_fsdp {float(scalars_f['loss_total']):.6f}",
      flush=True)
del state_f


class LocalLoader:
    """Each process's shard of the eval stream."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


eval_batch = dict(local)
eval_batch["batch_valid"] = np.ones(hi - lo, bool)
eval_batch["meta"] = [{"target": None} for _ in range(hi - lo)]
metrics = evaluate(
    model, state.params, LocalLoader([eval_batch]),
    eval_step=jax.jit(make_eval_step(model)),
    put_fn=to_global,
)
print(f"RESULT det_acc {metrics['det_acc']:.6f} "
      f"miou {metrics['decoder_miou']:.6f}", flush=True)
