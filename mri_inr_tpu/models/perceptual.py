"""Perceptual-loss autoencoder (VGG-ish conv blocks with BatchNorm).

Parity with the reference's ``src/networks/encoding/perceptual_encoder.py``
(studied, not copied): EncoderBlock = 2x(Conv3x3 -> BN -> LeakyReLU(0.2)) ->
MaxPool2; DecoderBlock mirrors with a stride-2 ConvTranspose; ``v2`` is the
2-stage variant on 24x24 inputs with a 256-d latent (the one the reference's
``PerceptualLoss`` uses, ``losses.py:14-57``); ``v1`` is the 3-stage
512->256 variant. The fully-connected blocks use BatchNorm1d + LeakyReLU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class EncoderBlock(nn.Module):
    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.compute_dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.compute_dtype, name=f"bn_{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        return nn.max_pool(x, (2, 2), strides=(2, 2))


class DecoderBlock(nn.Module):
    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.compute_dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.compute_dtype, name=f"bn_{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        return nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                dtype=self.compute_dtype, name="deconv")(x)


class FullyConnectedBlock(nn.Module):
    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, dtype=self.compute_dtype, name="fc")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         dtype=self.compute_dtype, name="bn")(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class PerceptualEncoderV2(nn.Module):
    """(B, 24, 24) -> (B, 256) feature extractor (2 conv stages + FC)."""

    img_size: int = 24
    latent_dim: int = 256
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        x = images.astype(self.compute_dtype)[..., None]
        x = EncoderBlock(64, self.compute_dtype, name="block_0")(x, train)
        x = EncoderBlock(128, self.compute_dtype, name="block_1")(x, train)
        x = x.reshape(x.shape[0], -1)
        return FullyConnectedBlock(self.latent_dim, self.compute_dtype,
                                   name="fc_block")(x, train)


class PerceptualAutoencoderV2(nn.Module):
    """24x24 reconstruction AE whose encoder is the perceptual-loss feature
    extractor (reference ``Autoencoder_v2``)."""

    img_size: int = 24
    latent_dim: int = 256
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = PerceptualEncoderV2(
            self.img_size, self.latent_dim, self.compute_dtype
        )
        self._min_ks = self.img_size // 4

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        z = self.encoder(images, train)
        m = self.img_size // 4
        x = FullyConnectedBlock(128 * m * m, self.compute_dtype,
                                name="dec_fc")(z, train)
        x = x.reshape(x.shape[0], m, m, 128)
        x = DecoderBlock(64, self.compute_dtype, name="dec_block_0")(x, train)
        x = DecoderBlock(1, self.compute_dtype, name="dec_block_1")(x, train)
        x = nn.sigmoid(x)
        return x[..., 0]

    def encode(self, images: jax.Array) -> jax.Array:
        return self.encoder(images, train=False)


class PerceptualEncoderV1(nn.Module):
    """(B, 24, 24) -> (B, 256) 3-stage feature extractor (reference
    ``Encoder_v1`` / the encoder half of ``Autoencoder_v1``,
    ``perceptual_encoder.py:155-204,368-394``): three conv stages down to
    3x3, then FC 512 -> 256."""

    img_size: int = 24
    latent_dim: int = 256
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        x = images.astype(self.compute_dtype)[..., None]
        x = EncoderBlock(64, self.compute_dtype, name="block_0")(x, train)
        x = EncoderBlock(128, self.compute_dtype, name="block_1")(x, train)
        x = EncoderBlock(256, self.compute_dtype, name="block_2")(x, train)
        x = x.reshape(x.shape[0], -1)
        x = FullyConnectedBlock(512, self.compute_dtype,
                                name="fc_block_0")(x, train)
        return FullyConnectedBlock(self.latent_dim, self.compute_dtype,
                                   name="fc_block_1")(x, train)


class PerceptualAutoencoderV1(nn.Module):
    """3-stage 24x24 reconstruction AE (reference ``Autoencoder_v1``)."""

    img_size: int = 24
    latent_dim: int = 256
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        z = PerceptualEncoderV1(
            self.img_size, self.latent_dim, self.compute_dtype,
            name="encoder",
        )(images, train)
        m = self.img_size // 8
        x = FullyConnectedBlock(512, self.compute_dtype,
                                name="dec_fc_0")(z, train)
        x = FullyConnectedBlock(256 * m * m, self.compute_dtype,
                                name="dec_fc_1")(x, train)
        x = x.reshape(x.shape[0], m, m, 256)
        x = DecoderBlock(128, self.compute_dtype, name="dec_block_0")(x, train)
        x = DecoderBlock(64, self.compute_dtype, name="dec_block_1")(x, train)
        x = DecoderBlock(1, self.compute_dtype, name="dec_block_2")(x, train)
        x = nn.sigmoid(x)
        return x[..., 0]
