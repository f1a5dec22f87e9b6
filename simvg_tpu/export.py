"""AOT serving export (``jax.export``): freeze the jitted serving
forward PLUS its weights into one portable StableHLO artifact.

No reference analogue — the reference serves from the live torch
process (/root/reference/simvg/apis/inference.py:20-140, model code +
checkpoint required at the serving site).  The TPU-native deployment
story is ahead-of-time: lower the serving function ONCE (weights baked
in as constants), serialize, and ship a single file that any JAX
process can deserialize and call — no model code, no config tree, no
checkpoint, no flax at the serving site.  Cross-platform lowering means
the artifact can be exported for TPU from a CPU-only build host.

Workflow (tools/misc/export_serving.py is the CLI):

    exp = export_serving(model, variables, sample_batch,
                         platforms=("tpu",), polymorphic_batch=True)
    save_exported("model.jaxexp", exp)
    # ... serving site:
    exp = load_exported("model.jaxexp")
    preds = exp.call(batch)     # {"decoder": {...}, "token": {...}}

The serving function is ``engine.train.make_eval_step`` (the same
decode path tools/test.py evaluates with): softmax -> drop no-object ->
per-query best -> boxes scaled to ``img_shape`` — so exported
predictions are bit-identical to the in-process eval path on the same
platform.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# The exported calling convention: one dict with exactly these keys
# (the loader's device batch minus host-only fields).
SERVING_INPUTS = ("image", "text_ids", "text_padding_mask", "img_shape")


def make_serving_fn(model, variables, device_norm: Optional[dict] = None):
    """Close ``variables`` over the eval step: ``fn(batch) -> preds``.

    ``device_norm``: pass the config's ``img_norm_cfg`` when the
    pipeline uses ``normalize_on_device=True`` (uint8 images in,
    normalization fused into the forward).
    """
    from simvg_tpu.engine.train import make_eval_step

    eval_step = make_eval_step(model, device_norm=device_norm)

    def serve(batch):
        return eval_step(variables, batch)

    return serve


def serving_specs(sample_batch, polymorphic_batch: bool = False):
    """ShapeDtypeStruct batch spec from one loader batch; with
    ``polymorphic_batch`` the leading axis becomes the symbolic
    dimension ``b`` (serve any batch size from one artifact)."""
    from jax import export as jexport

    if polymorphic_batch:
        (b,) = jexport.symbolic_shape("b")
    specs = {}
    for k in SERVING_INPUTS:
        v = jnp.asarray(sample_batch[k])
        shape = ((b,) + v.shape[1:]) if polymorphic_batch else v.shape
        specs[k] = jax.ShapeDtypeStruct(shape, v.dtype)
    return specs


def export_serving(model, variables, sample_batch, *,
                   platforms=("tpu",), polymorphic_batch: bool = False,
                   device_norm: Optional[dict] = None,
                   bake_weights: bool = True):
    """Lower + export the serving forward for ``platforms``.

    Returns a ``jax.export.Exported``.  Lowering for a platform does
    not require having that platform: export for TPU from a CPU host
    works.  ``platforms=None`` lowers for this process's default
    backend only.

    ``bake_weights=True`` (the deployment default): weights ride along
    as lowered constants — one self-contained artifact,
    ``exp.call(batch)``.  ``bake_weights=False``: weights stay an
    argument — ``exp.call(variables, batch)`` — for sites that swap
    checkpoints under one compiled program (and for benchmarking, where
    baking would haul the weights through the host).
    """
    from jax import export as jexport

    plats = list(platforms) if platforms is not None else None
    specs = serving_specs(sample_batch, polymorphic_batch)
    if bake_weights:
        fn = jax.jit(make_serving_fn(model, variables, device_norm))
        return jexport.export(fn, platforms=plats)(specs)

    from simvg_tpu.engine.train import make_eval_step

    eval_step = jax.jit(make_eval_step(model, device_norm=device_norm))
    var_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
    return jexport.export(eval_step, platforms=plats)(var_specs, specs)


def save_exported(path: str, exp) -> None:
    """Serialize an ``Exported`` to ``path`` (single file)."""
    with open(path, "wb") as f:
        f.write(bytes(exp.serialize()))


def load_exported(path: str):
    """Inverse of ``save_exported``; call via ``exp.call(batch)``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))
