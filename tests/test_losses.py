import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_inr_tpu.models.perceptual import PerceptualAutoencoderV2, PerceptualEncoderV2
from mri_inr_tpu.train import losses


def test_mse():
    a = jnp.ones((2, 4, 4))
    b = jnp.zeros((2, 4, 4))
    assert float(losses.mse(a, b)) == pytest.approx(1.0)


def test_sobel_maps_constant_zero():
    """Sobel of a constant image is zero in the interior."""
    img = jnp.full((1, 8, 8), 3.0)
    gx, gy = losses._sobel_maps(img)
    np.testing.assert_allclose(np.asarray(gx)[0, 1:-1, 1:-1], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy)[0, 1:-1, 1:-1], 0.0, atol=1e-6)


def test_sobel_maps_vertical_edge():
    """A vertical step edge produces horizontal gradient response."""
    img = jnp.concatenate([jnp.zeros((1, 8, 4)), jnp.ones((1, 8, 4))], axis=2)
    gx, gy = losses._sobel_maps(img)
    # gx responds at the edge columns; gy is zero in the interior
    assert np.abs(np.asarray(gx)[0, 2:-2, 3:5]).max() > 1.0
    np.testing.assert_allclose(np.asarray(gy)[0, 2:-2, :], 0.0, atol=1e-6)


def test_edge_loss_geq_mse(rng):
    pred = jnp.asarray(rng.uniform(size=(4, 24, 24)).astype(np.float32))
    target = jnp.asarray(rng.uniform(size=(4, 24, 24)).astype(np.float32))
    assert float(losses.edge_loss(pred, target)) >= float(
        losses.mse(pred, target)
    )
    assert float(losses.edge_loss(target, target)) == pytest.approx(0.0)


def test_perceptual_loss(rng):
    enc = PerceptualEncoderV2()
    x = jnp.asarray(rng.uniform(size=(4, 24, 24)).astype(np.float32))
    variables = enc.init(jax.random.key(0), x)
    loss_fn = losses.make_perceptual_loss(variables)
    assert float(loss_fn(x, x)) == pytest.approx(0.0)
    y = jnp.asarray(rng.uniform(size=(4, 24, 24)).astype(np.float32))
    assert float(loss_fn(x, y)) > 0
    # gradients flow to pred, not crash through frozen encoder
    g = jax.grad(lambda p: loss_fn(p, y))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_perceptual_autoencoder_shapes():
    ae = PerceptualAutoencoderV2()
    x = jnp.zeros((2, 24, 24))
    variables = ae.init(jax.random.key(0), x)
    out = ae.apply(variables, x)
    assert out.shape == (2, 24, 24)


def test_make_loss_fn_dispatch():
    assert losses.make_loss_fn("mse") is losses.mse
    assert losses.make_loss_fn("edge") is losses.edge_loss
    with pytest.raises(ValueError):
        losses.make_loss_fn("perceptual")
    with pytest.raises(ValueError):
        losses.make_loss_fn("nope")
