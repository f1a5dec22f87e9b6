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
    """nn.Dense-compatible w8a8 dynamic-quant linear layer."""

    features: int
    dtype: Any = jnp.bfloat16
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,),
                          jnp.float32)
        # per-output-channel weight scale (axis 0 = input features)
        w_q, s_w = quantize_symmetric(kernel, axis=0)  # s_w: [features]
        x_q, s_x = quantize_symmetric(x)  # per-tensor dynamic
        y = jax.lax.dot_general(
            x_q, w_q,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (s_x * s_w) + bias
        return y.astype(self.dtype)
