"""Training losses: MSE, Sobel edge loss, perceptual loss.

Parity with the reference (``src/util/losses.py``, studied not copied):
- Edge loss (``losses.py:60-121``): ``MSE(x, y) + 0.5 * (MSE(Gx(x), Gx(y)) +
  MSE(Gy(x), Gy(y)))`` with 3x3 Sobel kernels ``[[1,0,-1],[2,0,-2],[1,0,-1]]``
  (x) and its transpose (y), SAME padding.
- Perceptual loss (``losses.py:14-57``): MSE between features of a frozen
  pretrained ``Encoder_v2`` (here :class:`PerceptualEncoderV2`) applied to
  prediction and target.

All losses take (pred, target) of shape (B, H, W) and return a scalar; they
are pure functions of arrays (+ static params for perceptual), so they jit
and shard with the train step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mri_inr_tpu.models.perceptual import PerceptualEncoderV2

SOBEL_X = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
SOBEL_Y = SOBEL_X.T.copy()


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred - target))


def _sobel_maps(images: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Apply both Sobel kernels to a (B, H, W) batch. Returns
    (grad_x, grad_y), each (B, H, W), identical to a SAME-padded conv.

    Implemented as shift-and-add over a zero-padded copy rather than
    ``lax.conv_general_dilated``: the 3x3/2-channel conv composed with the
    fused-Pallas train step's custom_vjp sent XLA:TPU's convolution passes
    into a ~17-minute compile (measured on v5e via the axon relay; the
    same step with MSE compiles in ~30 s). The separable form
    ``sobel_x = [1,2,1]^T x [1,0,-1]`` needs 5 shifted adds per map and
    compiles with the rest of the elementwise graph."""
    p = jnp.pad(images, ((0, 0), (1, 1), (1, 1)))
    # vertical smoothing [1,2,1] (shared by both kernels), full width
    s = p[:, :-2, :] + 2.0 * p[:, 1:-1, :] + p[:, 2:, :]
    # horizontal smoothing [1,2,1] on the raw pad, full height
    t = p[:, :, :-2] + 2.0 * p[:, :, 1:-1] + p[:, :, 2:]
    gx = s[:, :, :-2] - s[:, :, 2:]  # x-derivative [1,0,-1]
    gy = t[:, :-2, :] - t[:, 2:, :]  # y-derivative (transposed kernel)
    return gx, gy


def edge_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    px, py = _sobel_maps(pred)
    tx, ty = _sobel_maps(target)
    return mse(pred, target) + 0.5 * (mse(px, tx) + mse(py, ty))


def make_perceptual_loss(encoder_variables, img_size: int = 24):
    """Build a perceptual loss closure over *frozen* perceptual-encoder
    variables (params + batch stats); the closure is jit/grad-safe and
    gradients do not flow into the encoder."""
    encoder = PerceptualEncoderV2(img_size=img_size)
    frozen = jax.lax.stop_gradient(encoder_variables)

    def loss(pred: jax.Array, target: jax.Array) -> jax.Array:
        f_pred = encoder.apply(frozen, pred, train=False)
        f_target = encoder.apply(frozen, target, train=False)
        return mse(f_pred, f_target)

    return loss


def make_loss_fn(criterion: str, perceptual_variables=None, img_size: int = 24):
    """Resolve a canonical criterion name (see configuration.CRITERIA) to a
    (pred, target) -> scalar function."""
    if criterion == "mse":
        return mse
    if criterion == "edge":
        return edge_loss
    if criterion == "perceptual":
        if perceptual_variables is None:
            raise ValueError(
                "criterion='perceptual' requires pretrained perceptual-encoder "
                "variables (training.perceptual_encoder_path)"
            )
        return make_perceptual_loss(perceptual_variables, img_size)
    raise ValueError(f"Unknown criterion {criterion!r}")
