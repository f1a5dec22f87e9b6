#!/usr/bin/env python
"""Training CLI.

Same surface as the reference's tools/train.py (args at
/root/reference/tools/train.py:27-48: config, --work-dir, --resume-from,
--load-from, --finetune-from, --seed, --cfg-options) driving the
TPU-native stack: static-shape host loader -> ONE jitted train step over
the device mesh -> per-epoch eval + best/latest checkpoints.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="simvg_tpu train")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--load-from", default=None)
    p.add_argument("--finetune-from", default=None)
    p.add_argument("--auto-resume", action="store_true",
                   help="resume from <work_dir>/latest if present "
                        "(crash recovery)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() from "
                        "the standard env (COORDINATOR_ADDRESS etc.)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--platform", default=None,
                   help="force jax platform (cpu for smoke tests)")
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="dotted overrides key=value")
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from simvg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # restarts/auto-resume skip recompiles
    if args.distributed or os.environ.get("COORDINATOR_ADDRESS"):
        # multi-host data parallelism: one process per host over DCN,
        # devices over ICI (replaces torch.distributed.run + NCCL,
        # SURVEY.md §2.8). jax.distributed.initialize() only
        # auto-detects on TPU pods/SLURM; the dist_train.sh env
        # contract must be forwarded explicitly everywhere else.
        if os.environ.get("COORDINATOR_ADDRESS"):
            jax.distributed.initialize(
                coordinator_address=os.environ["COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["NUM_PROCESSES"]),
                process_id=int(os.environ["PROCESS_ID"]),
            )
        else:
            jax.distributed.initialize()

    import jax.numpy as jnp
    import numpy as np

    from simvg_tpu.config import Config, parse_cfg_options
    from simvg_tpu.data.builder import (
        build_dataset_from_cfg,
        build_loader_from_cfg,
    )
    from simvg_tpu.engine import (
        create_optimizer,
        create_train_state,
        make_train_step,
    )
    from simvg_tpu.engine.evaluate import evaluate
    from simvg_tpu.models.builder import build_model
    from simvg_tpu.utils import get_root_logger, save_checkpoint
    from simvg_tpu.utils.checkpoint import load_checkpoint

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(parse_cfg_options(args.cfg_options))
    seed = args.seed if args.seed is not None else cfg.get("seed", 6666)
    if cfg.get("debug_nans", False):
        # sanitizer equivalent (SURVEY.md §5 race-detection row): abort
        # with a traceback on the first NaN produced under jit
        jax.config.update("jax_debug_nans", True)

    work_dir = args.work_dir or cfg.get("work_dir") or osp.join(
        "work_dir", osp.splitext(osp.basename(args.config))[0]
    )
    # rank-0-only host writes (the reference's is_main() gating,
    # utils/distributed.py:17-19): with a shared work_dir, concurrent
    # ranks would interleave metrics lines and race the checkpoint
    # tmp-dir swaps
    is_main = jax.process_index() == 0
    os.makedirs(work_dir, exist_ok=True)
    timestamp = time.strftime("%Y%m%d_%H%M%S")
    logger = get_root_logger(
        osp.join(work_dir, f"{timestamp}_train_log.txt")
        if is_main else None)
    if is_main:
        cfg.dump(osp.join(work_dir, "config.py"))
    logger.info(f"work_dir: {work_dir}; devices: {jax.devices()}")

    # ---- device mesh: ALWAYS created, so a single process drives all
    # its local chips data-parallel (the reference's 8-GPU DDP,
    # /root/reference/tools/train.py:102-103, maps to the standard TPU
    # topology of ONE process per host feeding 8 chips).
    from jax.sharding import NamedSharding, PartitionSpec as P

    from simvg_tpu.parallel import create_mesh, shard_params

    mesh = create_mesh(model_parallel=cfg.get("model_parallel", 1))
    dp = mesh.shape["data"]
    # ZeRO/FSDP: shard params + grads + opt state + EMA over the data
    # axis (parallel/mesh.py param_partition_spec) — the memory lever
    # for pod-scale ViT-L training; a no-op at dp=1
    from simvg_tpu.parallel import FSDP_MIN_SIZE

    fsdp = bool(cfg.get("fsdp", False))
    fsdp_min = int(cfg.get("fsdp_min_size", FSDP_MIN_SIZE))
    pc = jax.process_count()
    if dp % pc:
        raise ValueError(f"data-parallel size {dp} not divisible by "
                         f"process count {pc}")
    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    logger.info(f"mesh: {dict(mesh.shape)} "
                f"({dp}-way data parallel, {pc} process(es)"
                f"{', fsdp' if fsdp else ''})")
    if cfg.model.get("vis_enc", {}).get("seq_parallel"):
        # sequence parallelism resolves its bare-PartitionSpec
        # constraints against the ambient mesh; keep it entered for
        # the rest of the process (jit tracing happens lazily in the
        # epoch loop)
        import contextlib

        _mesh_ctx = contextlib.ExitStack()
        _mesh_ctx.enter_context(mesh)

    # ---- data
    img_size = cfg.get("img_size", 640)
    is_grec = cfg.get("dataset") == "GRefCOCO"
    nq = cfg.model.get("head", {}).get("num_queries", 1)
    # targets beyond the query count are unmatchable (the
    # reference's scipy matcher also pairs at most num_queries)
    max_gt = min(cfg.get("max_gt", 12 if is_grec else 1), nq)
    norm_on_device = cfg.get("normalize_on_device", False)
    train_ds = build_dataset_from_cfg(cfg.data.train,
                                      dataset_type=cfg.get("dataset"),
                                      seed=seed,
                                      normalize_on_device=norm_on_device)
    # samples_per_gpu is PER-CHIP (reference semantics: one DDP process
    # per GPU); each jax process loads its dp/pc chips' worth and the
    # global batch is spg * dp. Multi-host additionally shards the
    # batch stream by process (DistributedSampler role).
    train_loader = build_loader_from_cfg(
        train_ds, cfg, train=True, canvas=img_size, max_gt=max_gt,
        seed=seed, shard_id=jax.process_index(),
        num_shards=pc, batch_scale=dp // pc,
    )
    # dataset-size line (reference: mmcv runner logs len(dataset));
    # for Mixed this is the count AFTER img_source filtering
    logger.info(f"train: {len(train_ds)} samples, "
                f"{len(train_loader)} steps/epoch")
    val_loaders = {}
    eval_splits = [k for k in cfg.data
                   if k not in ("train", "samples_per_gpu",
                                "workers_per_gpu")]
    for split in eval_splits:
        ds = build_dataset_from_cfg(cfg.data[split],
                                    dataset_type=cfg.get("dataset"),
                                    tokenizer=train_ds.tokenizer,
                                    seed=seed,
                                    normalize_on_device=norm_on_device)
        # eval is sharded by process too (DistributedSampler role):
        # each host evaluates its slice, evaluate() allgather-sums the
        # counters; wrap-pad duplicate batches are flagged invalid
        val_loaders[split] = build_loader_from_cfg(
            ds, cfg, train=False, canvas=img_size, max_gt=max_gt,
            seed=seed, shard_id=jax.process_index(), num_shards=pc,
            batch_scale=dp // pc,
        )
        logger.info(f"{split}: {len(ds)} samples")

    # ---- model
    dtype = jnp.bfloat16 if cfg.get("use_bf16", True) else jnp.float32
    model, loss_cfg = build_model(cfg.model, img_size=img_size,
                                  dtype=dtype)
    if len(train_loader) == 0:
        raise ValueError(
            f"train loader is empty: global batch "
            f"{cfg.data.get('samples_per_gpu', 32)} x {dp} chips exceeds "
            f"the {len(train_ds)}-sample dataset (drop_last). Reduce "
            "data.samples_per_gpu."
        )
    sample = next(iter(train_loader))
    init_batch = {k: sample[k] for k in
                  ("image", "text_ids", "text_padding_mask", "img_shape")}
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, **init_batch)
    params = shard_params(params, mesh, fsdp=fsdp,
                          fsdp_min_size=fsdp_min)  # replicated when
    # model=1 and fsdp off; opt state + EMA inherit this placement
    # through tx.init / jnp.copy (computation follows data)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.info(f"model params: {n_params / 1e6:.2f}M")

    if loss_cfg.get("pretrain"):
        if osp.exists(loss_cfg["pretrain"]):
            from tools.convert_checkpoint import (
                load_pretrained_into_params,
            )

            params = load_pretrained_into_params(
                params, loss_cfg["pretrain"], logger=logger
            )
        else:
            logger.warning(
                f"pretrain checkpoint {loss_cfg['pretrain']} not found; "
                "training from random init"
            )

    # ---- optimizer / scheduler (reference keys, SURVEY.md §2.7)
    opt_cfg = cfg.get("optimizer_config", {})
    sch_cfg = cfg.get("scheduler_config", {})
    steps_per_epoch = max(len(train_loader), 1)
    max_epoch = sch_cfg.get("max_epoch", 30)
    lr = opt_cfg.get("lr", 5e-4)
    tx = create_optimizer(
        lr,
        steps_per_epoch,
        lr_vis_enc=opt_cfg.get("lr_vis_enc", lr / 10.0),
        lr_lan_enc=opt_cfg.get("lr_lan_enc", lr),
        betas=tuple(opt_cfg.get("betas", (0.9, 0.98))),
        eps=opt_cfg.get("eps", 1e-9),
        grad_norm_clip=cfg.get("grad_norm_clip", 0.15),
        warmup_epochs=sch_cfg.get("warmup_epochs", 3),
        decay_steps=tuple(sch_cfg.get("decay_steps", (25,))),
        decay_ratio=sch_cfg.get("decay_ratio", 0.1),
        freeze_layer=loss_cfg.get("freeze_layer", -1),
        optimizer_type=opt_cfg.get("type", "Adam"),
        scheduler_type=sch_cfg.get("type", "MultiStepLRWarmUp"),
        scheduler_kw=dict(sch_cfg),
        amsgrad=opt_cfg.get("amsgrad", True),
        weight_decay=opt_cfg.get("weight_decay", 0.0),
        mu_dtype=opt_cfg.get("mu_dtype"),
    )
    use_ema = cfg.get("ema", False)
    state = create_train_state(params, tx, ema=use_ema)
    del params
    # snapshot the fresh opt-state placement (inherited from the sharded
    # params via tx.init) BEFORE a resume overwrites it: the restore
    # re-place below must reproduce it exactly — with fsdp these leaves
    # are data-sharded (ZeRO), not replicated.  Leaves whose fresh
    # sharding is NOT on the mesh (eager-created scalars like the optax
    # count get SingleDeviceSharding on device 0) go replicated — a
    # device-0-committed scalar would clash with the mesh-placed params
    # inside jit.
    def _mesh_placement(x):
        s = getattr(x, "sharding", None)
        return s if getattr(s, "mesh", None) is mesh else replicated

    opt_placements = jax.tree.map(_mesh_placement, state.opt_state)

    # CLI flags take precedence; config keys (reference _base_/misc.py)
    # are the fallback so two-stage configs' load_from works untouched
    args.resume_from = args.resume_from or cfg.get("resume_from")
    resumed_best = -1.0  # overwritten when resuming (best_det_acc)
    args.load_from = args.load_from or cfg.get("load_from")
    args.finetune_from = args.finetune_from or cfg.get("finetune_from")
    for attr in ("load_from", "finetune_from"):
        v = getattr(args, attr)
        if v and not osp.exists(v):
            logger.warning(f"{attr}={v!r} does not exist; ignoring "
                           "(placeholder path in config?)")
            setattr(args, attr, None)

    if args.auto_resume and not args.resume_from:
        from simvg_tpu.utils.checkpoint import latest_checkpoint

        latest = latest_checkpoint(work_dir)
        if latest:
            args.resume_from = latest
            logger.info(f"auto-resume: found {latest}")

    start_epoch = 0
    if args.resume_from:
        ck = load_checkpoint(args.resume_from,
                             params_template=state.params,
                             opt_state_template=state.opt_state,
                             with_opt=True, with_ema=use_ema)
        resumed_step = ck["epoch"] * steps_per_epoch
        state = state.replace(
            params=ck["params"],
            opt_state=ck.get("opt_state", state.opt_state),
            ema_params=ck.get("ema_params", state.ema_params),
            step=jnp.asarray(resumed_step, jnp.int32),
            # restore the EMA warmup counter (fall back to the global
            # step, which equals it when EMA ran from step 0)
            ema_step=jnp.asarray(
                ck.get("ema_step") if ck.get("ema_step") is not None
                else resumed_step, jnp.int32),
        )
        start_epoch = ck["epoch"]
        # restore the best-checkpoint tracker too, or crash recovery
        # could overwrite det_best with a worse post-resume eval
        resumed_best = float(
            (ck.get("metrics") or {}).get("best_det_acc", -1.0))
        logger.info(f"resumed from {args.resume_from} @ epoch "
                    f"{start_epoch}")
    elif args.load_from:
        ck = load_checkpoint(args.load_from,
                             params_template=state.params,
                             with_ema=use_ema)
        state = state.replace(params=ck["params"],
                              ema_params=ck.get("ema_params",
                                                state.ema_params))
        logger.info(f"loaded weights from {args.load_from}")
    elif args.finetune_from:
        ck = load_checkpoint(args.finetune_from,
                             params_template=state.params)
        state = state.replace(params=ck["params"])
        logger.info(f"finetuned from {args.finetune_from}")

    if args.resume_from or args.load_from or args.finetune_from:
        # restored arrays live on the default device; re-place onto the
        # mesh (params by the TP/FSDP rules, opt state back onto its
        # fresh tx.init placement, which matches the params')
        state = state.replace(
            params=shard_params(state.params, mesh, fsdp=fsdp,
                                fsdp_min_size=fsdp_min),
            ema_params=(shard_params(state.ema_params, mesh, fsdp=fsdp,
                                     fsdp_min_size=fsdp_min)
                        if state.ema_params is not None else None),
            opt_state=jax.tree.map(
                lambda x, s: jax.device_put(x, s)
                if hasattr(x, "shape") else x,
                state.opt_state, opt_placements),
            step=jax.device_put(state.step, replicated),
            ema_step=(jax.device_put(state.ema_step, replicated)
                      if state.ema_step is not None else None),
        )

    from simvg_tpu.engine.train import make_eval_step

    device_norm = (dict(cfg.get("img_norm_cfg", {})) or None) \
        if norm_on_device else None
    eval_step = jax.jit(make_eval_step(model, device_norm=device_norm))
    train_step = jax.jit(
        make_train_step(
            model,
            tx,
            branch_loss_weight=loss_cfg["branch_loss_weight"],
            prepare_target_mode=loss_cfg["prepare_target_mode"],
            distill_type=loss_cfg["distill_type"],
            mlp_aux_loss=loss_cfg.get("mlp_aux_loss", False),
            ema_alpha=cfg.get("ema_factor", 0.999) if use_ema else None,
            dp_size=dp,
            with_metrics=not is_grec,
            return_predictions=is_grec,
            device_norm=device_norm,
        ),
        donate_argnums=(0,),
    )

    log_interval = cfg.get("log_interval", 50)
    evaluate_interval = cfg.get("evaluate_interval", 1)
    start_eval = cfg.get("start_evaluate_epoch", 0)
    best_acc = resumed_best
    step_rng = jax.random.PRNGKey(seed + 1)

    import json as _json

    from simvg_tpu.engine.train_state import make_lr_schedule

    # the SAME schedule builder create_optimizer uses, so the logged lr
    # always matches what the optimizer applies (incl. warm restarts)
    _lr_sched = make_lr_schedule(
        lr, steps_per_epoch,
        scheduler_type=sch_cfg.get("type", "MultiStepLRWarmUp"),
        warmup_epochs=sch_cfg.get("warmup_epochs", 3),
        decay_steps=tuple(sch_cfg.get("decay_steps", (25,))),
        decay_ratio=sch_cfg.get("decay_ratio", 0.1),
        scheduler_kw={k: v for k, v in sch_cfg.items()
                      if k in ("T_max", "eta_min", "T_0", "T_mult")},
    )

    metrics_path = osp.join(work_dir, "metrics.jsonl")

    def emit_metrics(kind, payload):
        """Structured metric stream (observability; replaces the
        reference's unused wandb dependency). Rank-0 only."""
        if not is_main:
            return
        with open(metrics_path, "a") as f:
            f.write(_json.dumps({"kind": kind, **payload}) + "\n")

    from simvg_tpu.data.prefetch import device_prefetch

    if pc > 1:
        # Multi-host path: every process contributes its local batch as
        # one shard of the global batch (global batch = pc * local),
        # assembled into jit-visible global arrays. Single-controller
        # semantics: all hosts run the same program.
        def to_global(batch):
            out = {}
            for k, v in batch.items():
                if k == "meta":
                    out[k] = v
                    continue
                gshape = (v.shape[0] * pc,) + v.shape[1:]
                out[k] = jax.make_array_from_process_local_data(
                    batch_sharding, np.asarray(v), gshape
                )
            return out

        def batch_stream(loader):
            for local in loader:
                yield to_global(local)
    else:
        # Single process, all local chips: batches land pre-sharded on
        # the "data" axis, so the jitted step runs dp-way data parallel
        # (DDP equivalent) without any per-step host work.
        def batch_stream(loader):
            return device_prefetch(iter(loader), size=2,
                                   sharding=batch_sharding)

    def eval_put(device_batch):
        if pc > 1:
            return {k: jax.make_array_from_process_local_data(
                batch_sharding, np.asarray(v),
                (v.shape[0] * pc,) + v.shape[1:])
                for k, v in device_batch.items()}
        return {k: jax.device_put(v, batch_sharding)
                for k, v in device_batch.items()}

    for epoch in range(start_epoch, max_epoch):
        train_loader.set_epoch(epoch)
        t_ep = time.time()
        t_data = time.time()
        for it, batch in enumerate(batch_stream(train_loader)):
            data_time = time.time() - t_data
            device_batch = {k: v for k, v in batch.items() if k != "meta"}
            if epoch == start_epoch and it == 0:
                img = device_batch["image"]
                logger.info(f"global batch image: shape={img.shape} "
                            f"sharding={img.sharding}")
            state, scalars = train_step(state, device_batch, step_rng)
            if (it + 1) % log_interval == 0 or it + 1 == steps_per_epoch:
                preds = scalars.pop("predictions", None)
                s = {k: float(v) for k, v in scalars.items()}
                if is_grec and preds is not None:
                    # train-time GRec metrics on host
                    # (apis/train.py:104-140 equivalent)
                    from simvg_tpu.engine.evaluate import _local_rows
                    from simvg_tpu.engine.metrics import grec_f1_nacc

                    for bname in ("decoder", "token"):
                        p = preds[bname]
                        # multi-host: only this process's shard rows are
                        # addressable; they correspond 1:1 to the local
                        # batch["meta"] enumerated below
                        boxes = _local_rows(p["boxes"])
                        scores = _local_rows(p["scores"])
                        gb, sc_l, gts, tgts = [], [], [], []
                        for i, m in enumerate(batch["meta"]):
                            gb.append(boxes[i])
                            sc_l.append(scores[i])
                            if m.get("gt_bbox_all") is not None:
                                gts.append(np.asarray(m["gt_bbox_all"]))
                            else:
                                nt = int(np.asarray(
                                    batch["gt_valid"][i]).sum())
                                gts.append(np.asarray(
                                    batch["gt_boxes"][i][:nt]))
                            tgts.append(m["target"])
                        gm = grec_f1_nacc(gb, sc_l, gts, tgts)
                        s[f"{bname}_F1"] = gm["F1_score"]
                        s[f"{bname}_Nacc"] = gm["N_acc"]
                msg = ", ".join(
                    f"{k}: {v:.4f}" for k, v in s.items()
                    if k.startswith("loss") or k.endswith("det_acc")
                    or k.endswith("_F1") or k.endswith("_Nacc")
                )
                cur_lr = float(_lr_sched(
                    jnp.asarray(epoch * steps_per_epoch + it)))
                logger.info(
                    f"train - epoch [{epoch + 1}]"
                    f"[{it + 1}/{steps_per_epoch}] "
                    f"data_time: {data_time:.3f}, lr: {cur_lr:.6f}, {msg}"
                )
                emit_metrics("train", {"epoch": epoch + 1, "iter": it + 1,
                                       "data_time": data_time, **s})
            t_data = time.time()
        ep_time = time.time() - t_ep
        global_bs = cfg.data.get("samples_per_gpu", 32) * dp
        logger.info(
            f"epoch {epoch + 1} done in {ep_time:.1f}s "
            f"({steps_per_epoch * global_bs / max(ep_time, 1e-9):.1f} "
            "img/s global)"
        )

        if (epoch + 1) % evaluate_interval == 0 and epoch >= start_eval:
            for split, loader in val_loaders.items():
                metrics = evaluate(model, state.params, loader,
                                   is_grec=is_grec,
                                   eval_step=eval_step,
                                   log_fn=logger.info,
                                   log_interval=log_interval,
                                   put_fn=eval_put)
                logger.info(f"eval[{split}] epoch {epoch + 1}: " + ", ".join(
                    f"{k}: {v:.2f}" for k, v in metrics.items()
                ))
                emit_metrics("eval", {"epoch": epoch + 1, "split": split,
                                      **metrics})
                if use_ema and state.ema_params is not None:
                    m_ema = evaluate(model, state.ema_params, loader,
                                     is_grec=is_grec,
                                     eval_step=eval_step,
                                     put_fn=eval_put)
                    logger.info(
                        f"eval[{split}][EMA] epoch {epoch + 1}: "
                        + ", ".join(f"{k}: {v:.2f}"
                                    for k, v in m_ema.items())
                    )
                if split == (("val" if "val" in val_loaders
                              else (eval_splits[0] if eval_splits
                                    else None))):
                    acc = metrics["det_acc"]
                    if acc > best_acc:
                        best_acc = acc
                        save_checkpoint(
                            work_dir, "det_best",
                            params=state.params,
                            ema_params=state.ema_params,
                            epoch=epoch + 1,
                            metrics=metrics,
                            ema_step=(int(state.ema_step) if state.ema_step is not None else None),
                        )

        # "latest" (crash recovery) carries the full opt_state — on a
        # slow-disk/1-core host that serialization dominates short
        # epochs, so experiment configs may throttle it; the final
        # epoch always saves (two-stage load_from contract)
        latest_interval = cfg.get("latest_interval", 1)
        if ((epoch + 1) % max(latest_interval, 1) == 0
                or epoch + 1 == max_epoch):
            save_checkpoint(
                work_dir, "latest",
                params=state.params,
                opt_state=state.opt_state,
                ema_params=state.ema_params,
                epoch=epoch + 1,
                metrics={"best_det_acc": best_acc},
                ema_step=(int(state.ema_step) if state.ema_step is not None else None),
            )
        save_interval = cfg.get("save_interval", -1)
        if save_interval and save_interval > 0 and (
                epoch + 1) % save_interval == 0:
            save_checkpoint(work_dir, f"epoch_{epoch + 1}",
                            params=state.params,
                            ema_params=state.ema_params,
                            epoch=epoch + 1,
                            ema_step=(int(state.ema_step) if state.ema_step is not None else None))

    from simvg_tpu.utils.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()
    logger.info(f"training done; best val det_acc {best_acc:.2f}")


if __name__ == "__main__":
    main()
