"""SIREN building blocks (Flax linen).

Behavioral parity with the reference (studied, not copied):
- ``Sine``/``Morlet`` activations (``src/networks/modulated_siren.py:31-80``):
  ``sin(w0*x)`` and ``sin(w0*x) * exp(-x**2/2)``.
- SIREN init (``modulated_siren.py:120-142``): weights and bias drawn from
  ``U(-s, s)`` with ``s = 1/dim_in`` for the first layer else
  ``sqrt(c/dim_in)/w0``, ``c = 6``.
- ``SirenNet`` (``modulated_siren.py:160-233``): ``num_layers`` hidden
  layers (first ``w0_initial=30``, rest ``w0=1``), dropout after activation,
  per-layer multiplicative FiLM modulation ``x *= mod[:, None, :]``; a final
  sine layer without modulation or dropout.
- ``Modulator`` (``modulated_siren.py:304-343``): per layer
  ``Linear -> ReLU`` with the latent re-concatenated to the hidden state
  before every subsequent layer.

TPU notes: all matmuls run through an optional compute dtype (bf16 on MXU);
params stay fp32. The fused Pallas forward in ``ops/siren_kernel.py``
consumes the exact same parameter pytree.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mri_inr_tpu.ops.fast_math import fast_sin


def siren_uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return init


def apply_activation(
    pre: jax.Array, w0: float, activation: str, exact: bool = False
) -> jax.Array:
    """Sine / Morlet activation. By default sine uses the polynomial
    ``fast_sin`` (|err| <= 5.9e-6 — fully hidden under the MXU matmuls on
    TPU, unlike XLA's sin; see ops/fast_math.py); ``exact=True`` selects
    XLA's precise sin for parity testing."""
    sin = jnp.sin if exact else fast_sin
    if activation == "morlet":
        return sin(w0 * pre) * jnp.exp(-0.5 * jnp.square(pre))
    return sin(w0 * pre)


class SirenLayer(nn.Module):
    """One sine(-or-Morlet)-activated linear layer with SIREN init."""

    features: int
    w0: float = 1.0
    c: float = 6.0
    is_first: bool = False
    use_bias: bool = True
    activation: str = "sine"
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32
    exact_sine: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dim_in = x.shape[-1]
        scale = (1.0 / dim_in) if self.is_first else (
            (self.c / dim_in) ** 0.5 / self.w0
        )
        kernel = self.param("kernel", siren_uniform_init(scale), (dim_in, self.features))
        x = x.astype(self.compute_dtype)
        pre = x @ kernel.astype(self.compute_dtype)
        if self.use_bias:
            bias = self.param("bias", siren_uniform_init(scale), (self.features,))
            pre = pre + bias.astype(self.compute_dtype)
        out = apply_activation(pre, self.w0, self.activation, self.exact_sine)
        if self.dropout > 0.0:
            out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        return out


class SirenNet(nn.Module):
    """Stack of modulated SIREN layers + unmodulated sine output layer.

    ``residual=True`` is the reference's residual-MLP ablation
    (``README.md:27,41`` — the code lives on its unreleased
    ``residual-connections`` branch, so the wiring here is our own design):
    every hidden layer after the first adds a skip connection around the
    modulated sine block, ``x = x + mod_i * sin(W_i x + b_i)``, which keeps
    deep stacks (the ablation pairs depth up with latent dim down) trainable.
    """

    dim_hidden: int = 256
    dim_out: int = 1
    num_layers: int = 5
    w0: float = 1.0
    w0_initial: float = 30.0
    use_bias: bool = True
    dropout: float = 0.1
    activation: str = "sine"
    residual: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    exact_sine: bool = False

    @nn.compact
    def __call__(
        self,
        coords: jax.Array,
        mods: Sequence[jax.Array] | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """coords: (B, S, dim_in); mods: num_layers arrays of (B, dim_hidden).

        Returns (B, S, dim_out).
        """
        x = coords
        for i in range(self.num_layers):
            h = SirenLayer(
                features=self.dim_hidden,
                w0=self.w0_initial if i == 0 else self.w0,
                is_first=i == 0,
                use_bias=self.use_bias,
                activation=self.activation,
                dropout=self.dropout,
                compute_dtype=self.compute_dtype,
                exact_sine=self.exact_sine,
                name=f"layer_{i}",
            )(x, deterministic=deterministic)
            if mods is not None:
                h = h * mods[i][:, None, :].astype(h.dtype)
            x = x + h if (self.residual and i > 0) else h
        # the output layer is ALWAYS sine-activated, even for Morlet models:
        # the reference builds its last Siren without an activation argument,
        # which defaults to Sine (modulated_siren.py:211-213 vs :120-123)
        out = SirenLayer(
            features=self.dim_out,
            w0=self.w0,
            use_bias=self.use_bias,
            activation="sine",
            compute_dtype=self.compute_dtype,
            exact_sine=self.exact_sine,
            name="last_layer",
        )(x, deterministic=deterministic)
        return out


class Modulator(nn.Module):
    """Latent -> per-layer FiLM modulations; the latent is re-concatenated
    before every layer after the first."""

    dim_hidden: int = 256
    num_layers: int = 5
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> tuple[jax.Array, ...]:
        z = z.astype(self.compute_dtype)
        x = z
        hiddens = []
        for i in range(self.num_layers):
            x = nn.Dense(
                self.dim_hidden, dtype=self.compute_dtype, name=f"layer_{i}"
            )(x)
            x = nn.relu(x)
            hiddens.append(x)
            x = jnp.concatenate([x, z], axis=-1)
        return tuple(hiddens)
