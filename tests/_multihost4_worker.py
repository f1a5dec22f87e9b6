"""Worker for the 4-process uneven-shard eval test (VERDICT r3 #5,
spawned by test_multihost.py).  Unlike _multihost_worker.py (hand-built
batches), this drives the REAL data path: RefCOCOUNC dataset ->
DataLoader with shard_id/num_shards slicing, group batching, text
buckets (pinned to the max bucket across hosts), and wrap-pad flagged
batches -> evaluate() with cross-process aggregation.  Run with
nproc=1 for the single-process oracle; det_acc/miou must be identical
because every real sample is counted exactly once either way
(reference semantics: DistributedSampler eval,
simvg/datasets/builder.py:31-37)."""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
data_root = sys.argv[4]
bs = int(sys.argv[5])

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=1"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
    " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from simvg_tpu.data import DataLoader, build_dataset  # noqa: E402
from simvg_tpu.data.transforms import (  # noqa: E402
    Normalize,
    Pad,
    Resize,
)
from simvg_tpu.engine.evaluate import evaluate  # noqa: E402
from simvg_tpu.engine.train import make_eval_step  # noqa: E402
from simvg_tpu.models import SimVGModel, SimVGConfig  # noqa: E402
from simvg_tpu.models.beit3 import BEiT3Config  # noqa: E402
from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig  # noqa: E402
from simvg_tpu.parallel import create_mesh  # noqa: E402

assert jax.device_count() == nproc
mesh = create_mesh()
bsh = NamedSharding(mesh, P("data"))

pipeline = [
    Resize((32, 32), keep_ratio=False),
    Normalize(mean=[123.675, 116.28, 103.53],
              std=[58.395, 57.12, 57.375]),
    Pad(size_divisor=32),
]
ds = build_dataset(
    "RefCOCOUNC", imgsfile=os.path.join(data_root, "images"),
    annsfile=os.path.join(data_root, "instances.json"),
    which_set="val", max_token=10, use_token_type="beit3",
    transforms=pipeline,
)
loader = DataLoader(ds, batch_size=bs, canvas=32, max_gt=1,
                    shuffle=False, num_workers=1,
                    shard_id=pid, num_shards=nproc,
                    text_buckets=[6, 10])

model = SimVGModel(SimVGConfig(
    beit3=BEiT3Config(img_size=32, patch_size=16, embed_dim=32,
                      num_heads=4, ffn_dim=64, num_layers=1,
                      vocab_size=64010, drop_path_rate=0.0),
    head=TGQSHeadConfig(num_queries=1, in_channels=32, embed_dim=32,
                        num_decoder_layers=1, num_tgqg_layers=1,
                        attn_dropout=0.0, ffn_dropout=0.0),
))

sample = next(iter(loader))
params = model.init(
    jax.random.PRNGKey(0),
    **{k: sample[k] for k in
       ("image", "text_ids", "text_padding_mask", "img_shape")})
params = jax.device_put(params, NamedSharding(mesh, P()))


def to_global(batch):
    return {k: jax.make_array_from_process_local_data(
        bsh, np.asarray(v), (v.shape[0] * nproc,) + v.shape[1:])
        for k, v in batch.items() if k != "meta"}


metrics = evaluate(model, params, loader,
                   eval_step=jax.jit(make_eval_step(model)),
                   put_fn=to_global)
print(f"RESULT steps {len(loader)}", flush=True)
print(f"RESULT n_samples {metrics['n_samples']:.1f}", flush=True)
print(f"RESULT det_acc {metrics['det_acc']:.6f}", flush=True)
print(f"RESULT miou {metrics['decoder_miou']:.6f}", flush=True)
