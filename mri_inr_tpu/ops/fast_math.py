"""Fast transcendental approximations for the SIREN hot path.

XLA's ``sin`` lowers to a precise but expensive (~20+ VPU-op) sequence that
does NOT overlap with MXU matmuls on v5e — measured on-chip it cuts the
5-layer sine-matmul chain from ~40 TF/s to ~15 TF/s, while this polynomial
version is fully hidden under the matmuls (~39 TF/s, i.e. free).

``fast_sin``: one cheap range reduction ``x - 2pi*round(x/(2pi))`` to
[-pi, pi] followed by a degree-9 odd minimax polynomial. Max absolute error
5.9e-6 over the full real line (coefficients fit by iterated weighted least
squares; see tests/test_fast_math.py) — three orders of magnitude below
bf16 resolution (~4e-3), so bf16 activations are bit-identical in
distribution, and safe for fp32 too at ~1e-5 fidelity.

Differentiable (it is plain polynomial arithmetic), so the same
implementation serves the training path; its derivative approximates
cos(x) to ~5e-5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 6.283185307179586
INV_TWO_PI = 0.15915494309189535

# degree-9 odd minimax over [-pi, pi]: sin(x) ~ x * P(x^2)
_C0 = 9.999793973572e-01
_C1 = -1.666243985636e-01
_C2 = 8.308990402314e-03
_C3 = -1.926507745066e-04
_C4 = 2.147913009143e-06

# degree-7 odd minimax over [-pi, pi], |err| <= 2.6e-4: one VPU FMA cheaper
# than the degree-9 chain; still 15x below bf16 resolution (~4e-3), so it is
# the right precision point for the bf16 eval kernel's activation.
_D0 = 9.992763920561e-01
_D1 = -1.656675056348e-01
_D2 = 7.958186419379e-03
_D3 = -1.450852979995e-04

# degree-5 odd minimax over [-pi, pi], |err| <= 7.0e-3 (~1.8x bf16
# resolution): two FMAs cheaper than degree-9. Each polynomial FMA removed
# is worth ~1.0 ms/call on the B=4096 eval kernel (measured v5e, see
# benchmarks/README.md); the measured quality cost on the trained quality
# checkpoint is ~0.05 dB PSNR — an opt-in speed mode, not the default.
_E0 = 9.8444443e-01
_E1 = -1.5347773e-01
_E2 = 5.4669000e-03

HALF_PI = 1.5707963267948966


def _fast_round(v: jax.Array) -> jax.Array:
    # floor(v + 0.5) == round-half-up: one VPU instruction. jnp.round's
    # round-half-away lowers to a multi-op sign-handling sequence on
    # Mosaic that costs ~5 ms/call on the bench kernel (measured v5e,
    # batch 4096: 14.5 ms -> ~9.6 ms with this). The half-up vs half-away
    # difference only moves the reduction target by one period at exact
    # half-period inputs, where the polynomial agrees on both ends.
    # stop_gradient matches jnp.round's zero derivative, keeping
    # d(fast_sin)/dx ~ cos(x).
    return jax.lax.stop_gradient(jnp.floor(v + 0.5))


def fast_sin(x: jax.Array) -> jax.Array:
    """Polynomial sine, |err| <= 5.9e-6 for |x| < 2^22, any float dtype
    (computed in fp32 internally, result cast back)."""
    dtype = x.dtype
    v = x.astype(jnp.float32)
    v = v - TWO_PI * _fast_round(v * INV_TWO_PI)
    v2 = v * v
    p = _C3 + v2 * _C4
    p = _C2 + v2 * p
    p = _C1 + v2 * p
    p = _C0 + v2 * p
    return (v * p).astype(dtype)


def fast_sin7(x: jax.Array) -> jax.Array:
    """Degree-7 polynomial sine, |err| <= 2.6e-4 — one FMA cheaper than
    :func:`fast_sin`; use where bf16 resolution (~4e-3) bounds the useful
    precision (the fused eval kernel's activation)."""
    dtype = x.dtype
    v = x.astype(jnp.float32)
    v = v - TWO_PI * _fast_round(v * INV_TWO_PI)
    v2 = v * v
    p = _D2 + v2 * _D3
    p = _D1 + v2 * p
    p = _D0 + v2 * p
    return (v * p).astype(dtype)


def fast_sin5(x: jax.Array) -> jax.Array:
    """Degree-5 polynomial sine, |err| <= 7.0e-3 — two FMAs cheaper than
    :func:`fast_sin`; eval speed mode (`sin5` kernel knob), quality cost
    measured in benchmarks/README.md."""
    dtype = x.dtype
    v = x.astype(jnp.float32)
    v = v - TWO_PI * _fast_round(v * INV_TWO_PI)
    v2 = v * v
    p = _E1 + v2 * _E2
    p = _E0 + v2 * p
    return (v * p).astype(dtype)


def fast_sin7_bf16(x: jax.Array) -> jax.Array:
    """Degree-7 sine with the POLYNOMIAL evaluated in bf16 (range reduction
    stays fp32 — 2pi*round in bf16 would lose ~0.03 absolute for |x|~10).

    Rationale: on VPUs with packed-bf16 ALUs this halves the cost of the
    5-op polynomial tail. Accuracy: bf16 rounding of v (eps ~0.016 at pi)
    bounds the result at ~1e-2 absolute — ~2x the bf16 resolution the
    activation is about to be quantized to for the next MXU matmul anyway.
    Opt-in (`sin_bf16` kernel knob), OFF by default; see the measured
    schedule table in benchmarks/README.md before enabling."""
    v = x.astype(jnp.float32)
    v = v - TWO_PI * _fast_round(v * INV_TWO_PI)
    v = v.astype(jnp.bfloat16)
    v2 = v * v
    p = jnp.bfloat16(_D2) + v2 * jnp.bfloat16(_D3)
    p = jnp.bfloat16(_D1) + v2 * p
    p = jnp.bfloat16(_D0) + v2 * p
    return v * p


def fast_cos(x: jax.Array) -> jax.Array:
    """Polynomial cosine via ``fast_sin(x + pi/2)`` — same 5.9e-6 error
    envelope. Used by the fused training kernel's backward pass where
    d(sin(w0*p))/dp = w0*cos(w0*p)."""
    dtype = x.dtype
    return fast_sin(x.astype(jnp.float32) + HALF_PI).astype(dtype)


def fast_cos5(x: jax.Array) -> jax.Array:
    """Degree-5 polynomial cosine via ``fast_sin5(x + pi/2)`` (|err| <=
    7e-3) — the derivative partner of :func:`fast_sin5` for the training
    kernel's degree-5 speed mode (``training.sin5``)."""
    dtype = x.dtype
    return fast_sin5(x.astype(jnp.float32) + HALF_PI).astype(dtype)
