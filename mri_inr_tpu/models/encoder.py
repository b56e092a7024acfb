"""Patch encoders: custom conv autoencoder and VGG16 variant (Flax linen).

Behavioral parity with the reference (studied, not copied):
- ``FixedAutoencoder`` (``src/networks/encoding/siren_encoder.py:485-542``):
  encoder Conv(1->16, k3, s2, p1) -> LeakyReLU(0.2) -> Conv(16->32, k3, s2,
  p1) -> LeakyReLU -> Conv(32->64, k8, valid) -> LeakyReLU -> Flatten ->
  Linear(64->latent); mirrored ConvTranspose decoder with Sigmoid.
- ``FixedEncoder`` (``siren_encoder.py:551-577``): the encoder half, used as
  the ``custom`` latent encoder and *fine-tuned jointly* with the SIREN
  (``modulated_siren.py:252-255`` registers it trainable).
- VGG variant (``modulated_siren.py:256-262``): VGG16 conv stack with a
  1-channel first conv, adaptive average pool to 7x7, then
  ``Linear(512*49 -> latent)``.

Layout is NHWC (TPU-native); patches arrive as (B, P, P) single-channel.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def leaky_relu(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=0.2)


class ConvEncoder(nn.Module):
    """The ``custom`` patch encoder: (B, 32, 32) -> (B, latent_dim)."""

    latent_dim: int = 256
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches: jax.Array) -> jax.Array:
        x = patches.astype(self.compute_dtype)[..., None]  # NHWC
        x = nn.Conv(16, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                    dtype=self.compute_dtype, name="conv1")(x)
        x = leaky_relu(x)
        x = nn.Conv(32, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                    dtype=self.compute_dtype, name="conv2")(x)
        x = leaky_relu(x)
        x = nn.Conv(64, (8, 8), padding="VALID", dtype=self.compute_dtype,
                    name="conv3")(x)
        x = leaky_relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.latent_dim, dtype=self.compute_dtype, name="fc")(x)


class ConvDecoder(nn.Module):
    """Mirror decoder: (B, latent_dim) -> (B, 32, 32) in [0, 1]."""

    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        x = nn.Dense(64, dtype=self.compute_dtype, name="fc")(z.astype(self.compute_dtype))
        x = leaky_relu(x)
        x = x.reshape(x.shape[0], 1, 1, 64)
        x = nn.ConvTranspose(32, (8, 8), padding="VALID",
                             dtype=self.compute_dtype, name="deconv1")(x)
        x = leaky_relu(x)
        x = nn.ConvTranspose(16, (3, 3), strides=(2, 2), padding="SAME",
                             dtype=self.compute_dtype, name="deconv2")(x)
        x = leaky_relu(x)
        x = nn.ConvTranspose(1, (3, 3), strides=(2, 2), padding="SAME",
                             dtype=self.compute_dtype, name="deconv3")(x)
        x = nn.sigmoid(x)
        return x[..., 0]


class ConvAutoencoder(nn.Module):
    """Pretraining autoencoder (identity reconstruction on fully-sampled
    tiles, as the reference's ``train_encoder.py`` does)."""

    latent_dim: int = 256
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ConvEncoder(self.latent_dim, self.compute_dtype)
        self.decoder = ConvDecoder(self.compute_dtype)

    def __call__(self, patches: jax.Array) -> jax.Array:
        return self.decoder(self.encoder(patches))

    def encode(self, patches: jax.Array) -> jax.Array:
        return self.encoder(patches)


def adaptive_avg_pool_2d(x: jax.Array, output_size: tuple[int, int]) -> jax.Array:
    """torch ``AdaptiveAvgPool2d`` semantics on NHWC input: output bin (i, j)
    averages input rows ``floor(i*H/oh) : ceil((i+1)*H/oh)`` (and likewise
    for columns). Handles both down- and up-"pooling" with static shapes."""
    _, h, w, _ = x.shape
    oh, ow = output_size

    def pool_axis(arr, size, out, axis):
        pieces = []
        for i in range(out):
            start = (i * size) // out
            end = -(-((i + 1) * size) // out)
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(start, end)
            pieces.append(jnp.mean(arr[tuple(sl)], axis=axis, keepdims=True))
        return jnp.concatenate(pieces, axis=axis)

    x = pool_axis(x, h, oh, 1)
    x = pool_axis(x, w, ow, 2)
    return x


VGG16_CONFIG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                512, 512, 512, "M", 512, 512, 512, "M")


class VGGTrunk(nn.Module):
    """The VGG16 conv stack with 1-channel input: (B, P, P) -> NHWC feature
    map after 5 conv stages + maxpools (1x1x512 for 32x32 patches). Shared
    between :class:`VGGEncoder` (the SIREN's ``vgg`` encoder_type) and
    :class:`VGGAutoencoder` (in-framework pretraining), so pretrained conv
    weights transplant by subtree copy (the TPU-native stand-in for the
    reference's ImageNet-checkpoint load, ``vgg.py:25-363`` — no egress
    here, so initialization comes from AE pretraining instead)."""

    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches: jax.Array) -> jax.Array:
        x = patches.astype(self.compute_dtype)[..., None]
        conv_idx = 0
        for item in VGG16_CONFIG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(item, (3, 3), padding="SAME", use_bias=conv_idx > 0,
                            dtype=self.compute_dtype, name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
        return x


class VGGEncoder(nn.Module):
    """VGG16-style conv encoder with 1-channel input, adaptive 7x7 pool and
    a latent projection head (the reference's ``vgg`` encoder_type)."""

    latent_dim: int = 256
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches: jax.Array) -> jax.Array:
        x = VGGTrunk(self.compute_dtype, name="trunk")(patches)
        x = adaptive_avg_pool_2d(x, (7, 7))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.latent_dim, dtype=self.compute_dtype, name="fc")(x)


class VGGDecoder(nn.Module):
    """Mirror decoder: NHWC trunk features -> (B, P, P) in [0, 1]. Five
    ConvTranspose-upsampled stages reversing the VGG16 stage channels."""

    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        stages = ((512, 512, 512), (512, 512, 512), (256, 256, 256),
                  (128, 128), (64, 64))
        x = feats.astype(self.compute_dtype)
        idx = 0
        for chs in stages:
            x = nn.ConvTranspose(chs[0], (2, 2), strides=(2, 2),
                                 dtype=self.compute_dtype,
                                 name=f"up_{idx}")(x)
            x = nn.relu(x)
            for c in chs[1:]:
                x = nn.Conv(c, (3, 3), padding="SAME",
                            dtype=self.compute_dtype, name=f"conv_{idx}")(x)
                x = nn.relu(x)
                idx += 1
            idx += 1
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=self.compute_dtype,
                    name="out")(x)
        return nn.sigmoid(x)[..., 0]


class VGGAutoencoder(nn.Module):
    """VGG16 autoencoder for in-framework pretraining of the ``vgg``
    encoder_type (reference ``VGGAutoEncoder``, ``vgg.py:25-363``; there it
    loads an ImageNet checkpoint — here the equivalent initialization is
    produced by ``train_encoder.py --model vgg`` on MRI tiles, and
    ``splice_pretrained_vgg_trunk`` installs the trunk into the SIREN)."""

    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.trunk = VGGTrunk(self.compute_dtype)
        self.decoder = VGGDecoder(self.compute_dtype)

    def __call__(self, patches: jax.Array) -> jax.Array:
        return self.decoder(self.trunk(patches))

    def encode(self, patches: jax.Array) -> jax.Array:
        return self.trunk(patches)


class LatentEncoder(nn.Module):
    """Dispatching wrapper (the reference's ``Encoder``,
    ``modulated_siren.py:236-301``): ``custom`` -> ConvEncoder (identity fc),
    ``vgg`` -> VGGEncoder (latent projection)."""

    latent_dim: int = 256
    encoder_type: str = "custom"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches: jax.Array) -> jax.Array:
        if self.encoder_type == "custom":
            return ConvEncoder(self.latent_dim, self.compute_dtype,
                               name="encoder")(patches)
        elif self.encoder_type == "vgg":
            return VGGEncoder(self.latent_dim, self.compute_dtype,
                              name="encoder")(patches)
        raise ValueError(f"Unknown encoder_type {self.encoder_type!r}")
