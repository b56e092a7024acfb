"""Top-level modulated SIREN model.

Parity with the reference ``ModulatedSiren``
(``src/networks/modulated_siren.py:346-457``, studied not copied):
encoder -> modulator -> SIREN over a fixed ``linspace(-1, 1, siren_patch)``
ij-meshgrid coordinate grid, output reshaped to (B, siren, siren).

The flax ``__call__`` is the differentiable training path. For inference the
fused Pallas kernel (``mri_inr_tpu.ops.siren_kernel``) consumes this
module's parameter pytree directly — same math, one kernel, activations
VMEM-resident.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from mri_inr_tpu.models.encoder import LatentEncoder
from mri_inr_tpu.models.siren import Modulator, SirenNet


@functools.lru_cache(maxsize=None)
def _coordinate_grid_np(size: int):
    import numpy as np

    lin = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    ii, jj = np.meshgrid(lin, lin, indexing="ij")
    return np.stack([ii, jj], axis=-1).reshape(size * size, 2)


def coordinate_grid(size: int) -> jax.Array:
    """(size*size, 2) coordinates in [-1, 1]^2, row-major (i, j) order —
    matches the reference's meshgrid buffer (modulated_siren.py:427-433)."""
    return jnp.asarray(_coordinate_grid_np(size))


class ModulatedSiren(nn.Module):
    dim_in: int = 2
    dim_hidden: int = 256
    dim_out: int = 1
    num_layers: int = 5
    latent_dim: int = 256
    w0: float = 1.0
    w0_initial: float = 30.0
    use_bias: bool = True
    dropout: float = 0.1
    encoder_type: str = "custom"
    outer_patch_size: int = 32
    inner_patch_size: int = 16
    siren_patch_size: int = 24
    activation: str = "sine"
    residual: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    exact_sine: bool = False

    def setup(self):
        self.net = SirenNet(
            dim_hidden=self.dim_hidden,
            dim_out=self.dim_out,
            num_layers=self.num_layers,
            w0=self.w0,
            w0_initial=self.w0_initial,
            use_bias=self.use_bias,
            dropout=self.dropout,
            activation=self.activation,
            residual=self.residual,
            compute_dtype=self.compute_dtype,
            exact_sine=self.exact_sine,
        )
        self.modulator = Modulator(
            dim_hidden=self.dim_hidden,
            num_layers=self.num_layers,
            compute_dtype=self.compute_dtype,
        )
        self.encoder = LatentEncoder(
            latent_dim=self.latent_dim,
            encoder_type=self.encoder_type,
            compute_dtype=self.compute_dtype,
        )

    def __call__(self, tiles: jax.Array, deterministic: bool = True) -> jax.Array:
        """tiles: (B, outer, outer) undersampled patches ->
        (B, siren, siren) reconstructed patch centers."""
        batch = tiles.shape[0]
        latent = self.encoder(tiles)
        mods = self.modulator(latent)
        coords = jnp.broadcast_to(
            coordinate_grid(self.siren_patch_size).astype(self.compute_dtype),
            (batch, self.siren_patch_size**2, 2),
        )
        out = self.net(coords, mods, deterministic=deterministic)
        return out[..., 0].reshape(
            batch, self.siren_patch_size, self.siren_patch_size
        )

    def encode(self, tiles: jax.Array) -> jax.Array:
        return self.encoder(tiles)

    def modulations(self, tiles: jax.Array) -> tuple[jax.Array, ...]:
        return self.modulator(self.encoder(tiles))


def from_config(model_cfg, precision: str = "fp32") -> ModulatedSiren:
    """Build from a :class:`mri_inr_tpu.configuration.ModelConfig`."""
    return ModulatedSiren(
        dim_in=model_cfg.dim_in,
        dim_hidden=model_cfg.dim_hidden,
        dim_out=model_cfg.dim_out,
        num_layers=model_cfg.num_layers,
        latent_dim=model_cfg.latent_dim,
        w0=model_cfg.w0,
        w0_initial=model_cfg.w0_initial,
        use_bias=model_cfg.use_bias,
        dropout=model_cfg.dropout,
        encoder_type=model_cfg.encoder_type,
        outer_patch_size=model_cfg.outer_patch_size,
        inner_patch_size=model_cfg.inner_patch_size,
        siren_patch_size=model_cfg.siren_patch_size,
        activation=model_cfg.activation,
        residual=getattr(model_cfg, "residual", False),
        compute_dtype=jnp.bfloat16 if precision == "bf16" else jnp.float32,
    )
