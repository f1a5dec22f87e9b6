#!/usr/bin/env python
"""Parameter counting per submodule (reference
tools/misc/parameters.py: counts DETR-decoder params)."""

from __future__ import annotations

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--platform", default="cpu")
    args = p.parse_args()

    import os

    os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from simvg_tpu.models.builder import build_model

    if args.config:
        from simvg_tpu.config import Config

        cfg = Config.fromfile(args.config)
        img_size = cfg.get("img_size", 640)
        model, _ = build_model(cfg.model, img_size=img_size)
        t = cfg.get("max_token", 20)
    else:
        img_size, t = 640, 20
        model, _ = build_model(
            {"vis_enc": {"vit_type": "base", "patch_size": 32,
                         "img_size": img_size},
             "head": {"num_queries": 1, "in_channels": 768}},
            img_size=img_size,
        )

    params = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            image=jnp.zeros((1, img_size, img_size, 3)),
            text_ids=jnp.zeros((1, t), jnp.int32),
            text_padding_mask=jnp.zeros((1, t), jnp.int32),
            img_shape=jnp.full((1, 2), img_size, jnp.int32),
        )
    )

    totals = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for kp, v in flat:
        keys = [str(getattr(k, "key", k)) for k in kp]
        # group by top module and, inside head, by sub-block
        if "head" in keys:
            i = keys.index("head")
            group = "head/" + (keys[i + 1] if len(keys) > i + 1 else "")
        else:
            group = keys[1] if len(keys) > 1 else keys[0]
        totals[group] = totals.get(group, 0) + int(np.prod(v.shape))

    width = max(len(k) for k in totals)
    total = 0
    for k in sorted(totals):
        print(f"{k:<{width}}  {totals[k] / 1e6:9.3f}M")
        total += totals[k]
    print("-" * (width + 12))
    print(f"{'total':<{width}}  {total / 1e6:9.3f}M")


if __name__ == "__main__":
    main()
