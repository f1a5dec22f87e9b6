"""fast_gelu / fast_erf accuracy and mode-selection tests
(simvg_tpu/ops/gelu.py; reference activation is torch F.gelu exact —
simvg/models/vis_encs/beit/beit3_base.py FFN)."""

import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.ops.gelu import fast_erf, fast_gelu


def test_fast_erf_accuracy_whole_line():
    from scipy import special

    x = np.linspace(-40, 40, 200001).astype(np.float32)
    got = np.asarray(fast_erf(jnp.asarray(x)))
    want = special.erf(x.astype(np.float64))
    assert np.max(np.abs(got - want)) < 5e-6


def test_fast_gelu_accuracy_and_grad():
    x = np.linspace(-12, 12, 50001).astype(np.float32)
    got = np.asarray(fast_gelu(jnp.asarray(x)))
    want = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
    assert np.max(np.abs(got - want)) < 5e-6

    # differentiable, with gelu'(0) = 0.5 and saturating tails
    g = jax.vmap(jax.grad(lambda v: fast_gelu(v)))(
        jnp.asarray([-10.0, -1.0, 0.0, 1.0, 10.0]))
    np.testing.assert_allclose(np.asarray(g[2]), 0.5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g[0]), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g[4]), 1.0, atol=1e-4)


def test_gelu_impl_selection():
    """auto => exact erf under fp32 (torch parity path), fast under
    bf16 (where the 1.8e-6 error is ~100x below bf16 resolution)."""
    from simvg_tpu.models.beit3 import BEiT3Config, _gelu_fn

    x32 = jnp.asarray(np.linspace(-3, 3, 1001), jnp.float32)
    exact = jax.nn.gelu(x32, approximate=False)

    auto32 = _gelu_fn(BEiT3Config(dtype=jnp.float32))(x32)
    np.testing.assert_array_equal(np.asarray(auto32), np.asarray(exact))

    auto16 = _gelu_fn(BEiT3Config(dtype=jnp.bfloat16))(x32)
    assert auto16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(auto16, np.float32), np.asarray(exact),
        atol=0.05, rtol=0.05)
