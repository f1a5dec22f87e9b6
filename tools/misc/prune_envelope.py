#!/usr/bin/env python
"""Token-prune accuracy-envelope re-validation on REAL weights
(VERDICT r4 #8).

The envelope defaults enforced by ``BEiT3Config`` (prune depth >=
num_layers/3, keep >= 75% of patch tokens — simvg_tpu/models/beit3.py)
were measured on synthetic tiny/deep probes (ROADMAP "Token pruning").
This tool re-measures them the moment a converted real checkpoint
exists: it sweeps (token_prune_layer, keep) over a val split,
evaluating the TOKEN branch (the only branch pruning serves), and
reports the accuracy delta of every point against the unpruned
baseline — the data from which the envelope constants should be
regenerated.

Wired into `make parity` as an optional stage (PRUNE_SWEEP=1).

Usage:
    python tools/misc/prune_envelope.py CONFIG CHECKPOINT \
        [--which-set val] [--keep-fracs 0.75 0.625 0.5] \
        [--layer-fracs 0.33 0.5] [--max-batches N] [--budget 0.3]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser(description="token-prune envelope sweep")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--which-set", default="val")
    p.add_argument("--keep-fracs", type=float, nargs="*",
                   default=[0.75, 0.625, 0.5],
                   help="fractions of patch tokens kept")
    p.add_argument("--layer-fracs", type=float, nargs="*",
                   default=[1 / 3, 0.5],
                   help="prune depth as a fraction of num_layers")
    p.add_argument("--max-batches", type=int, default=0,
                   help="bound eval cost (0 = full split)")
    p.add_argument("--budget", type=float, default=0.3,
                   help="max acceptable token det_acc drop (points)")
    p.add_argument("--out", default=None,
                   help="write the sweep table as JSON")
    p.add_argument("--platform", default=None)
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from simvg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from simvg_tpu.config import Config, parse_cfg_options
    from simvg_tpu.data.builder import (
        build_dataset_from_cfg,
        build_loader_from_cfg,
    )
    from simvg_tpu.engine.evaluate import evaluate
    from simvg_tpu.engine.train import make_eval_step
    from simvg_tpu.models.builder import build_model
    from simvg_tpu.utils import get_root_logger
    from simvg_tpu.utils.checkpoint import load_checkpoint

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(parse_cfg_options(args.cfg_options))
    logger = get_root_logger()
    img_size = cfg.get("img_size", 640)
    dtype = jnp.bfloat16 if cfg.get("use_bf16", True) else jnp.float32

    ds = build_dataset_from_cfg(cfg.data[args.which_set],
                                dataset_type=cfg.get("dataset"),
                                seed=cfg.get("seed", 6666))
    loader = build_loader_from_cfg(ds, cfg, train=False,
                                   canvas=img_size, max_gt=1,
                                   seed=cfg.get("seed", 6666))

    def run_point(vis_overrides):
        mcfg = json.loads(json.dumps(dict(cfg.model)))  # deep copy
        mcfg["vis_enc"].update(vis_overrides)
        model, _ = build_model(mcfg, img_size=img_size, dtype=dtype)
        sample = next(iter(loader))
        params = dict(model.init(
            jax.random.PRNGKey(0),
            **{k: sample[k] for k in ("image", "text_ids",
                                      "text_padding_mask",
                                      "img_shape")}))
        params = load_checkpoint(args.checkpoint,
                                 params_template=params)["params"]
        step = jax.jit(make_eval_step(model))
        m = evaluate(model, params, loader, eval_step=step,
                     max_batches=args.max_batches or None)
        return float(m["token_det_acc"])

    ps = cfg.model["vis_enc"].get("patch_size", 32)
    n_layers = cfg.model["vis_enc"].get(
        "num_layers",
        24 if cfg.model["vis_enc"].get("vit_type") == "large" else 12)
    n_patches = (img_size // ps) ** 2

    base = run_point({"token_prune_keep": None})
    logger.info(f"baseline (unpruned) token det_acc: {base:.2f}")

    rows = []
    for lf in args.layer_fracs:
        # valid prune points are 0..num_layers-2 (pruning after the
        # last layer would be a no-op the encoder rejects)
        layer = min(max(0, round(n_layers * lf)), n_layers - 2)
        for kf in args.keep_fracs:
            keep = max(1, round(n_patches * kf))
            acc = run_point({"token_prune_keep": keep,
                             "token_prune_layer": layer,
                             "token_prune_force": True})
            drop = base - acc
            ok = drop <= args.budget
            rows.append(dict(layer=layer, layer_frac=round(lf, 3),
                             keep=keep, keep_frac=round(kf, 3),
                             token_det_acc=round(acc, 2),
                             drop=round(drop, 2), within_budget=ok))
            logger.info(
                f"layer={layer} ({lf:.2f}L) keep={keep} ({kf:.2f}) "
                f"-> {acc:.2f} (drop {drop:+.2f}) "
                f"{'OK' if ok else 'OVER BUDGET'}")

    # recommended envelope: the shallowest layer-frac and smallest
    # keep-frac for which EVERY sweep point at-or-above them held the
    # budget (conservative rectangle, same shape as the shipped gate)
    ok_rows = [r for r in rows if r["within_budget"]]
    rec = None
    if ok_rows:
        for lf in sorted(set(r["layer_frac"] for r in ok_rows)):
            for kf in sorted(set(r["keep_frac"] for r in ok_rows)):
                covered = [r for r in rows
                           if r["layer_frac"] >= lf
                           and r["keep_frac"] >= kf]
                if covered and all(r["within_budget"] for r in covered):
                    rec = dict(min_layer_frac=lf, min_keep_frac=kf)
                    break
            if rec:
                break
    summary = dict(baseline_token_det_acc=round(base, 2),
                   budget=args.budget, sweep=rows,
                   recommended_envelope=rec)
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        logger.info(f"wrote {args.out}")
    if rec:
        logger.info(
            f"recommended envelope: prune layer >= "
            f"{rec['min_layer_frac']:.2f}*num_layers, keep >= "
            f"{rec['min_keep_frac']:.2f}*patch tokens "
            f"(current shipped gate: 1/3 and 0.75 — update "
            f"BEiT3Config if these differ)")
    else:
        logger.info("NO sweep point held the budget — token pruning "
                    "should stay force-gated on these weights")


if __name__ == "__main__":
    main()
