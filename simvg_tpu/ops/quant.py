"""int8 serving quantization (opt-in perf lever, VERDICT r2 #3).

The v5e MXU runs int8 matmuls at ~2x the bf16 rate; the encoder's
parameter matmuls (q/k/v/out projections + FFN) carry ~80% of the
flagship FLOPs, so w8a8 on those is the one lever left above the
attention bandwidth floor (ROADMAP.md "Perf analysis").

``Int8Dense`` is a drop-in for ``nn.Dense`` with the SAME parameter
layout ("kernel" [in, out] f32 + "bias" f32), so converted reference
checkpoints load unchanged and quantization happens at serving time:

- weights: symmetric per-output-channel int8 (scale = max|w|/127);
- activations: symmetric per-tensor DYNAMIC int8 (scale from the live
  batch max, fp32);
- int8 x int8 -> int32 accumulation on the MXU
  (``preferred_element_type=int32``), rescaled to fp32 and biased.

The reference has no quantized path (fp16 via apex at most,
/root/reference/tools/train.py:96-100); this is serving-only and
opt-in (``BEiT3Config.quant="int8"``) because accuracy on released
weights is unvalidated in this environment — bench.py reports the
numeric drift vs bf16 alongside the throughput.

Three modes (``BEiT3Config.quant``):

- ``"int8"`` — fully dynamic w8a8: weights AND activations quantized
  inside every forward.  Zero setup, but the requantization streams
  (weight max+round each step, activation max+round each matmul) run
  at the ~100 G elem/s elementwise floor and ate most of the MXU gain
  when measured (+2.2%, ROADMAP.md "Levers").
- ``"int8_calib"`` — calibration pass: the f32/bf16 forward runs
  unchanged while each layer records the running max |activation| into
  a mutable ``"quant"`` collection (run with ``mutable=["quant"]``).
- ``"int8_static"`` — serving: weights are PRE-quantized offline
  (``build_quant_collection``) and activation scales are the calibrated
  constants, so the only remaining per-step elementwise work is the
  activation round/clip (fusable into the producer); no max-reductions,
  no weight requant.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_symmetric(w: jnp.ndarray, axis=None):
    """Symmetric int8 quantization. Returns (int8 values, f32 scale)."""
    a = jnp.abs(w.astype(jnp.float32))
    amax = a.max() if axis is None else a.max(axis=axis)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


class Int8Dense(nn.Module):
    """nn.Dense-compatible w8a8 linear layer.

    ``mode``: "dynamic" (per-forward quantization of weights and
    activations), "calib" (normal matmul; records running max
    |activation| into the mutable "quant" collection), "static"
    (reads pre-quantized weights + calibrated activation scale from
    the "quant" collection — see ``build_quant_collection``).
    The "params" collection layout is identical in every mode
    ("kernel" [in, out] f32 + "bias" f32), so converted reference
    checkpoints load unchanged.
    """

    features: int
    dtype: Any = jnp.bfloat16
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()
    mode: str = "dynamic"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,),
                          jnp.float32)

        if self.mode == "calib":
            amax = self.variable("quant", "act_amax",
                                 lambda: jnp.zeros((), jnp.float32))
            # x.size is static under trace; a zero-length segment (the
            # single-modality encoder modes route (B, 0, D) slices
            # through every dense) has no max identity and nothing to
            # record.
            if (x.size > 0 and not self.is_initializing()
                    and self.is_mutable_collection("quant")):
                amax.value = jnp.maximum(
                    amax.value, jnp.abs(x.astype(jnp.float32)).max())
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
            return (y.astype(jnp.float32) + bias).astype(self.dtype)

        if self.mode == "qat":
            # Quantization-aware training: FAKE-quantize weights and
            # activations (quantize -> dequantize on the int8 grid) so
            # the forward sees serving-time rounding while the
            # backward passes straight through (STE: the quantization
            # residual is wrapped in stop_gradient, so d(fq(v))/dv =
            # 1 inside the clip range).  Train with quant="int8_qat",
            # then serve the resulting checkpoint with int8_static —
            # the params layout is identical.
            def fq(v, axis=None):
                q, s = quantize_symmetric(v, axis=axis)
                deq = q.astype(jnp.float32) * s
                v32 = v.astype(jnp.float32)
                return v32 + jax.lax.stop_gradient(deq - v32)

            if x.size == 0:
                y = x.astype(self.dtype) @ kernel.astype(self.dtype)
                return (y.astype(jnp.float32) + bias).astype(self.dtype)
            w_fq = fq(kernel, axis=0)  # per-output-channel, like serving
            x_fq = fq(x)  # per-tensor dynamic, like serving
            y = x_fq.astype(self.dtype) @ w_fq.astype(self.dtype)
            return (y.astype(jnp.float32) + bias).astype(self.dtype)

        if self.mode == "static":
            w_q = self.variable(
                "quant", "w_q",
                lambda: quantize_symmetric(kernel, axis=0)[0])
            s_w = self.variable(
                "quant", "s_w",
                lambda: quantize_symmetric(kernel, axis=0)[1])
            act_scale = self.variable(
                "quant", "act_scale", lambda: jnp.ones((), jnp.float32))
            s_x = jnp.maximum(act_scale.value / 127.0, 1e-8)
            x_q = jnp.clip(
                jnp.round(x.astype(jnp.float32) / s_x), -127, 127
            ).astype(jnp.int8)
            y = jax.lax.dot_general(
                x_q, w_q.value,
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (s_x * s_w.value) + bias
            return y.astype(self.dtype)

        # dynamic: per-output-channel weight scale (axis 0 = input
        # features), per-tensor dynamic activation scale
        if x.size == 0:
            # zero-length segment: the activation max-reduction has no
            # identity and the output is zero-size anyway.
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
            return (y.astype(jnp.float32) + bias).astype(self.dtype)
        w_q, s_w = quantize_symmetric(kernel, axis=0)  # s_w: [features]
        x_q, s_x = quantize_symmetric(x)
        y = jax.lax.dot_general(
            x_q, w_q,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (s_x * s_w) + bias
        return y.astype(self.dtype)


def build_quant_collection(params, quant_skeleton, act_amax=None,
                           margin: float = 1.0):
    """Build the "quant" collection for an ``int8_static`` model.

    params: the model's "params" collection (f32 kernels, any layout —
    including scan-stacked [L, in, out] kernels).
    quant_skeleton: the "quant" collection structure from
    ``jax.eval_shape(static_model.init, ...)["quant"]`` — its module
    paths name exactly the quantized layers.
    act_amax: optional "quant" collection produced by a calibration run
    (mode="int8_calib" with ``mutable=["quant"]``) holding per-layer
    max |activation|; when absent, activation scales default to 1.0.
    margin: multiplier on the calibrated amax (headroom for activations
    beyond the calibration set).

    Pure jnp tree surgery — jit it for on-device construction.
    """
    from flax import traverse_util

    flat_q = traverse_util.flatten_dict(quant_skeleton)
    flat_p = traverse_util.flatten_dict(params)
    flat_a = (traverse_util.flatten_dict(act_amax)
              if act_amax is not None else {})
    out = {}
    for path, leaf in flat_q.items():
        mod, name = path[:-1], path[-1]
        if name in ("w_q", "s_w"):
            kernel = jnp.asarray(flat_p[mod + ("kernel",)], jnp.float32)
            # per-(stack, output-channel) scale: reduce the input axis
            amax = jnp.abs(kernel).max(axis=-2)
            scale = jnp.maximum(amax / 127.0, 1e-8)
            if name == "s_w":
                out[path] = scale
            else:
                q = jnp.clip(
                    jnp.round(kernel / scale[..., None, :]), -127, 127)
                out[path] = q.astype(jnp.int8)
        elif name == "act_scale":
            a = flat_a.get(mod + ("act_amax",))
            if a is None:
                out[path] = jnp.ones(leaf.shape, jnp.float32)
            else:
                out[path] = jnp.maximum(
                    jnp.asarray(a, jnp.float32) * margin, 1e-8)
        else:  # pragma: no cover - future-proofing
            raise KeyError(f"unknown quant leaf {path}")
    return traverse_util.unflatten_dict(out)


def requantize_weights(params, quant_skeleton, qcol):
    """Re-quantize w_q/s_w from ``params`` while keeping the calibrated
    ``act_scale`` entries of ``qcol``.

    Activation scales transfer across weight sets that share the same
    activation statistics (EMA vs raw weights of the same run), but the
    quantized weights must come from the params actually being served —
    a calibration .npz built from the raw weights would silently serve
    stale weights under ``--with-ema``.
    """
    from flax import traverse_util

    fresh = build_quant_collection(params, quant_skeleton)
    flat_f = traverse_util.flatten_dict(fresh)
    flat_q = traverse_util.flatten_dict(qcol)
    missing = [p for p in flat_f
               if p[-1] == "act_scale" and p not in flat_q]
    if missing:
        # a silent 1.0 fallback saturates post-LN activations — a
        # layout mismatch (e.g. scan-stacked 'layers' calibration
        # served into an unrolled 'layers_N' model) must fail loudly
        raise ValueError(
            "calibration artifact has no act_scale for "
            f"{['/'.join(p) for p in missing[:3]]}"
            f"{'...' if len(missing) > 3 else ''} — was it calibrated "
            "with a different model layout (scan_layers / names)?")
    for path in flat_f:
        if path[-1] == "act_scale":
            flat_f[path] = jnp.asarray(flat_q[path], jnp.float32)
    return traverse_util.unflatten_dict(flat_f)


def save_quant_collection(path: str, qcol) -> None:
    """Persist a "quant" collection as .npz (keys = '/'-joined module
    paths) — the serving artifact produced by
    tools/misc/quantize_serving.py."""
    import numpy as np
    from flax import traverse_util

    flat = traverse_util.flatten_dict(qcol)
    np.savez(path, **{"/".join(k): np.asarray(v)
                      for k, v in flat.items()})


def attach_static_quant(variables, quant_skel, quant_npz=None):
    """Attach the "quant" collection to restored serving variables.

    Checkpoints never carry "quant" (it is a serving artifact), so CLIs
    restore with a params-only template and re-attach here:

    - ``quant_skel`` is the collection ``model.init`` produced (popped
      off the restore template); ``None`` for non-quantized models, in
      which case ``variables`` is returned unchanged.
    - ``quant_npz`` is a calibrated artifact from
      tools/misc/quantize_serving.py; its ``act_scale`` entries are
      kept while w_q/s_w are re-quantized from the params being
      attached (so EMA weights get EMA quantization, not the raw
      weights baked into the .npz). When absent the loaded weights are
      pre-quantized on the fly with activation scales defaulting to
      1.0 — post-LN activations routinely exceed 1, so this SATURATES
      and is only usable for smoke tests; a loud warning is emitted.
    """
    if quant_npz is not None:
        if quant_skel is None:
            raise SystemExit(
                "--quant-collection given but the model has no quant "
                "layers; set model.vis_enc.quant=int8_static")
        # only the scalar act_scale entries are used (w_q/s_w are
        # re-quantized from the params being attached) — don't haul
        # the npz's full int8 weight set through the host->device
        # tunnel just to discard it
        qcol = load_quant_collection(quant_npz, only=("act_scale",))
        variables = dict(variables)
        variables["quant"] = jax.jit(
            lambda p: requantize_weights(p, quant_skel, qcol)
        )(variables["params"])
    elif quant_skel is not None:
        import logging

        logging.getLogger("simvg_tpu").warning(
            "int8_static without --quant-collection: activation scales "
            "default to 1.0, which saturates post-LN activations and "
            "destroys accuracy. Calibrate with "
            "tools/misc/quantize_serving.py and pass the .npz.")
        variables = dict(variables)
        variables["quant"] = jax.jit(
            lambda p: build_quant_collection(p, quant_skel)
        )(variables["params"])
    return variables


def load_quant_collection(path: str, only=None):
    """Inverse of ``save_quant_collection``; returns the collection to
    pass as ``{"params": ..., "quant": <this>}`` to an ``int8_static``
    model's apply.  ``only`` restricts loading to the named leaf kinds
    (e.g. ``("act_scale",)``) so callers that re-derive the rest don't
    pay the host->device transfer for discarded arrays."""
    import numpy as np
    from flax import traverse_util

    with np.load(path) as z:
        flat = {tuple(k.split("/")): jnp.asarray(z[k]) for k in z.files
                if only is None or k.split("/")[-1] in only}
    return traverse_util.unflatten_dict(flat)
