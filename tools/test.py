#!/usr/bin/env python
"""Evaluation CLI (reference tools/test.py:20-134): multi-split eval
(val/testA/testB or Mixed sub-vals) from a checkpoint, optional EMA."""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="simvg_tpu test")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--with-ema", action="store_true",
                   help="also evaluate the EMA weights")
    p.add_argument("--quant-collection", default=None,
                   help=".npz from tools/misc/quantize_serving.py "
                        "(use with model.vis_enc.quant=int8_static)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() from "
                        "the dist_train.sh env contract")
    p.add_argument("--platform", default=None)
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from simvg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # restarts/auto-resume skip recompiles
    if args.distributed or os.environ.get("COORDINATOR_ADDRESS"):
        # same contract as tools/train.py (dist_test.sh header)
        if os.environ.get("COORDINATOR_ADDRESS"):
            jax.distributed.initialize(
                coordinator_address=os.environ["COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["NUM_PROCESSES"]),
                process_id=int(os.environ["PROCESS_ID"]),
            )
        else:
            jax.distributed.initialize()
    import jax.numpy as jnp

    from simvg_tpu.config import Config
    from simvg_tpu.data.builder import (
        build_dataset_from_cfg,
        build_loader_from_cfg,
    )
    from simvg_tpu.engine.evaluate import evaluate
    from simvg_tpu.models.builder import build_model
    from simvg_tpu.utils import get_root_logger
    from simvg_tpu.utils.checkpoint import load_checkpoint

    from simvg_tpu.config import parse_cfg_options

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(parse_cfg_options(args.cfg_options))

    logger = get_root_logger()

    # device mesh: shard eval batches over all local chips (matches
    # tools/train.py; reference evaluates under DDP the same way)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from simvg_tpu.parallel import create_mesh, shard_params

    mesh = create_mesh(model_parallel=cfg.get("model_parallel", 1))
    dp = mesh.shape["data"]
    fsdp = bool(cfg.get("fsdp", False))  # eval-side param sharding
    pc = jax.process_count()
    if dp % pc:
        raise ValueError(f"data-parallel size {dp} not divisible by "
                         f"process count {pc}")
    batch_sharding = NamedSharding(mesh, P("data"))
    logger.info(f"mesh: {dict(mesh.shape)} ({pc} process(es))")
    if cfg.model.get("vis_enc", {}).get("seq_parallel"):
        # seq_parallel constraints need the ambient mesh at trace time
        import contextlib

        _mesh_ctx = contextlib.ExitStack()
        _mesh_ctx.enter_context(mesh)

    seed = cfg.get("seed", 6666)
    img_size = cfg.get("img_size", 640)
    is_grec = cfg.get("dataset") == "GRefCOCO"
    nq = cfg.model.get("head", {}).get("num_queries", 1)
    # targets beyond the query count are unmatchable (the
    # reference's scipy matcher also pairs at most num_queries)
    max_gt = min(cfg.get("max_gt", 12 if is_grec else 1), nq)

    dtype = jnp.bfloat16 if cfg.get("use_bf16", True) else jnp.float32
    model, _ = build_model(cfg.model, img_size=img_size, dtype=dtype)

    splits = [s for s in cfg.data
              if s not in ("train", "samples_per_gpu",
                           "workers_per_gpu")]
    norm_on_device = cfg.get("normalize_on_device", False)
    loaders = {}
    tokenizer = None
    for s in splits:
        ds = build_dataset_from_cfg(cfg.data[s],
                                    dataset_type=cfg.get("dataset"),
                                    tokenizer=tokenizer, seed=seed,
                                    normalize_on_device=norm_on_device)
        tokenizer = ds.tokenizer
        # each process loads its dp/pc chips' worth of ITS shard of the
        # split (DistributedSampler role); evaluate() allgather-sums
        # the counters, wrap-pad duplicate batches are flagged invalid
        loaders[s] = build_loader_from_cfg(ds, cfg, train=False,
                                           canvas=img_size, max_gt=max_gt,
                                           seed=seed,
                                           shard_id=jax.process_index(),
                                           num_shards=pc,
                                           batch_scale=dp // pc)

    first = next(iter(loaders.values()))
    sample = next(iter(first))
    params = dict(model.init(
        jax.random.PRNGKey(0),
        **{k: sample[k] for k in
           ("image", "text_ids", "text_padding_mask", "img_shape")},
    ))
    # int8_static models carry a "quant" collection checkpoints never
    # have: split it off the restore template, re-attach after.
    from simvg_tpu.ops.quant import attach_static_quant

    quant_skel = params.pop("quant", None)
    ck = load_checkpoint(args.checkpoint, params_template=params,
                         with_ema=args.with_ema)
    params = shard_params(
        attach_static_quant(ck["params"], quant_skel,
                            args.quant_collection), mesh, fsdp=fsdp)

    def eval_put(device_batch):
        if pc > 1:
            # multi-process: each host's local batch is one shard of
            # the global array (only addressable devices are fed)
            import numpy as np

            return {k: jax.make_array_from_process_local_data(
                batch_sharding, np.asarray(v),
                (v.shape[0] * pc,) + v.shape[1:])
                for k, v in device_batch.items()}
        return {k: jax.device_put(v, batch_sharding)
                for k, v in device_batch.items()}

    import jax as _jax

    from simvg_tpu.engine.train import make_eval_step

    device_norm = (dict(cfg.get("img_norm_cfg", {})) or None) \
        if norm_on_device else None
    eval_step = _jax.jit(make_eval_step(model, device_norm=device_norm))
    for s, loader in loaders.items():
        m = evaluate(model, params, loader, is_grec=is_grec,
                     eval_step=eval_step,
                     log_fn=logger.info,
                     log_interval=cfg.get("log_interval", 50),
                     put_fn=eval_put)
        logger.info(f"[{s}] " + ", ".join(
            f"{k}: {v:.2f}" for k, v in m.items()))
        if args.with_ema and ck.get("ema_params") is not None:
            # quant weights are re-quantized from the EMA params while
            # the .npz's calibrated activation scales are kept
            # (attach_static_quant semantics)
            m = evaluate(model,
                         shard_params(attach_static_quant(
                             ck["ema_params"], quant_skel,
                             args.quant_collection), mesh, fsdp=fsdp),
                         loader, is_grec=is_grec, eval_step=eval_step,
                         put_fn=eval_put)
            logger.info(f"[{s}][EMA] " + ", ".join(
                f"{k}: {v:.2f}" for k, v in m.items()))


if __name__ == "__main__":
    main()
