"""Benchmark: REC inference throughput (images/sec/chip) on the flagship
SimVG model (BEiT3-base/32 @ 640px, dual-branch head, bf16).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference publishes NO latency/throughput numbers
in-repo (BASELINE.md; its only perf tool is
tools/misc/inference_time.py).  ``vs_baseline`` is therefore computed
against a documented estimate of the reference's GPU throughput:
~120 images/sec on an RTX3090 for ViT-B/32 @640 batch inference
(fp32 torch, dual-branch).  Replace when a measured reference number
exists.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_IMAGES_PER_SEC_ESTIMATE = 120.0
BATCH = 32
ITERS = 20
WARMUP = 2


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _batch, _flagship
    from simvg_tpu.models.model import decode_predictions

    model, _, t, cfg = _flagship()
    b = BATCH
    batch = _batch(b, t, cfg.beit3.img_size, rng=0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # Shape-only init: avoids compiling a second large program just to
    # materialise parameters (timing is weight-independent; weights are
    # random normal so softmax/giou paths stay numerically healthy).
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            image=batch["image"][:1],
            text_ids=batch["text_ids"][:1],
            text_padding_mask=batch["text_padding_mask"][:1],
            img_shape=batch["img_shape"][:1],
        )
    )
    rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            rng.normal(0, 0.02, s.shape).astype(s.dtype)
        ),
        shapes,
    )

    def one_pass(params, image, text_ids, text_padding_mask, img_shape):
        out = model.apply(
            params,
            image=image,
            text_ids=text_ids,
            text_padding_mask=text_padding_mask,
            img_shape=img_shape,
            deterministic=True,
        )
        preds = {
            name: decode_predictions(out[ck][-1], out[bk][-1], img_shape)
            for name, ck, bk in (
                ("decoder", "class_decoder", "bbox_decoder"),
                ("token", "class_token", "bbox_token"),
            )
        }
        return (preds["token"]["best_score"].sum()
                + preds["decoder"]["best_score"].sum())

    @jax.jit
    def infer_n(params, image, text_ids, text_padding_mask, img_shape):
        # ITERS forwards inside ONE executable: host<->device round
        # trips (expensive over the tunnelled runtime) are amortised.
        # The carry perturbs the input infinitesimally so XLA cannot
        # hoist the loop body as loop-invariant.
        def body(i, acc):
            s = one_pass(params, image + acc * 1e-38, text_ids,
                         text_padding_mask, img_shape)
            return acc + s

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    args = (params, batch["image"], batch["text_ids"],
            batch["text_padding_mask"], batch["img_shape"])
    for _ in range(WARMUP):
        float(infer_n(*args))  # host fetch guarantees completion

    t0 = time.perf_counter()
    float(infer_n(*args))
    dt = time.perf_counter() - t0

    n_chips = max(jax.device_count(), 1)
    imgs_per_sec_per_chip = BATCH * ITERS / dt / n_chips
    print(json.dumps({
        "metric": "rec_inference_images_per_sec_per_chip",
        "value": round(float(imgs_per_sec_per_chip), 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(
            float(imgs_per_sec_per_chip) / REFERENCE_IMAGES_PER_SEC_ESTIMATE,
            3,
        ),
    }))


if __name__ == "__main__":
    main()
