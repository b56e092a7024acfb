import jax
import jax.numpy as jnp
import numpy as np

from mri_inr_tpu.ops.fast_math import fast_sin


def test_fast_sin_accuracy_core_range():
    x = jnp.linspace(-np.pi, np.pi, 100001)
    err = np.abs(np.asarray(fast_sin(x)) - np.sin(np.asarray(x)))
    assert err.max() < 1e-5


def test_fast_sin_large_arguments():
    """Range reduction: stays accurate for |x| up to the SIREN first-layer
    scale (w0=30 on [-1,1] inputs -> args up to ~45)."""
    x = jnp.linspace(-100.0, 100.0, 200001)
    err = np.abs(np.asarray(fast_sin(x)) - np.sin(np.asarray(x, np.float64)))
    assert err.max() < 5e-5  # fp32 range-reduction rounding included


def test_fast_sin_bf16_exact_to_resolution():
    x = jnp.linspace(-3.0, 3.0, 4097, dtype=jnp.bfloat16)
    got = np.asarray(fast_sin(x)).astype(np.float32)
    expected = np.sin(np.asarray(x).astype(np.float32))
    assert np.abs(got - expected).max() < 0.01  # within bf16 quantization


def test_fast_sin_differentiable():
    g = jax.grad(lambda v: fast_sin(v))(0.3)
    assert abs(float(g) - np.cos(0.3)) < 1e-4
    # grad through a whole vector
    gv = jax.vmap(jax.grad(fast_sin))(jnp.linspace(-3, 3, 101))
    np.testing.assert_allclose(
        np.asarray(gv), np.cos(np.linspace(-3, 3, 101)), atol=1e-4
    )


def test_fast_sin_odd_symmetry():
    # exact odd symmetry everywhere except exact half-period points, where
    # the floor-based round-half-up reduction picks opposite periods for
    # +/-x; the polynomial is ~0 (within its 5.9e-6 bound) on both ends
    # there, so symmetry still holds to the approximation tolerance.
    x = jnp.linspace(0, np.pi, 101)
    np.testing.assert_allclose(
        np.asarray(fast_sin(-x)), -np.asarray(fast_sin(x)), atol=1.5e-5
    )
    interior = x[1:-1]  # no half-period points: symmetry is exact
    np.testing.assert_allclose(
        np.asarray(fast_sin(-interior)), -np.asarray(fast_sin(interior)), atol=1e-7
    )


def test_fast_sin7_accuracy():
    from mri_inr_tpu.ops.fast_math import fast_sin7

    x = jnp.linspace(-50.0, 50.0, 200001)
    err = np.abs(np.asarray(fast_sin7(x)) - np.sin(np.asarray(x, np.float64)))
    # degree-7 minimax bound 2.6e-4 — still 15x under bf16 resolution
    assert err.max() < 3e-4


def test_fast_sin5_accuracy():
    from mri_inr_tpu.ops.fast_math import fast_sin5

    x = jnp.linspace(-50.0, 50.0, 200001)
    err = np.abs(np.asarray(fast_sin5(x)) - np.sin(np.asarray(x, np.float64)))
    # degree-5 minimax bound 7.0e-3 (speed mode; ~1.8x bf16 resolution)
    assert err.max() < 7.5e-3


def test_fast_cos_accuracy():
    from mri_inr_tpu.ops.fast_math import fast_cos

    x = jnp.linspace(-50.0, 50.0, 200001)
    err = np.abs(np.asarray(fast_cos(x)) - np.cos(np.asarray(x, np.float64)))
    assert err.max() < 5e-5


def test_fast_sin7_bf16_accuracy():
    """bf16 polynomial tail: bounded by bf16 rounding of the reduced
    argument (~eps(pi) = 0.0157 plus accumulation), not by the minimax."""
    from mri_inr_tpu.ops.fast_math import fast_sin7_bf16

    x = jnp.linspace(-50.0, 50.0, 200001, dtype=jnp.float32)
    err = np.abs(
        np.asarray(fast_sin7_bf16(x), np.float64) - np.sin(np.asarray(x, np.float64))
    )
    assert err.max() < 0.05
