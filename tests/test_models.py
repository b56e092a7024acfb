import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_inr_tpu.models import ModulatedSiren, Modulator, SirenNet
from mri_inr_tpu.models.encoder import (
    ConvAutoencoder,
    ConvEncoder,
    VGGEncoder,
    adaptive_avg_pool_2d,
)
from mri_inr_tpu.models.modulated_siren import coordinate_grid
from mri_inr_tpu.models.siren import SirenLayer


def test_coordinate_grid():
    g = np.asarray(coordinate_grid(24))
    assert g.shape == (576, 2)
    assert g[0].tolist() == [-1.0, -1.0]
    assert g[-1].tolist() == [1.0, 1.0]
    # row-major (i, j): second element advances j
    assert g[1, 0] == -1.0 and g[1, 1] > -1.0


def test_siren_layer_init_distribution():
    layer = SirenLayer(features=256, w0=1.0, is_first=False)
    params = layer.init(jax.random.key(0), jnp.zeros((1, 256)))
    k = np.asarray(params["params"]["kernel"])
    bound = np.sqrt(6.0 / 256) / 1.0
    assert np.abs(k).max() <= bound
    assert np.abs(k).max() > 0.8 * bound  # actually fills the range
    first = SirenLayer(features=256, w0=30.0, is_first=True)
    p2 = first.init(jax.random.key(0), jnp.zeros((1, 2)))
    k2 = np.asarray(p2["params"]["kernel"])
    assert np.abs(k2).max() <= 1 / 2


def test_siren_layer_forward_manual():
    """Flax forward equals manual sin(w0 * (x @ W + b))."""
    layer = SirenLayer(features=8, w0=30.0, is_first=True, exact_sine=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2)), jnp.float32)
    params = layer.init(jax.random.key(1), x)
    out = layer.apply(params, x)
    W = params["params"]["kernel"]
    b = params["params"]["bias"]
    expected = np.sin(30.0 * (np.asarray(x) @ np.asarray(W) + np.asarray(b)))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_morlet_activation():
    layer = SirenLayer(features=8, w0=1.0, activation="morlet", exact_sine=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 4)), jnp.float32)
    params = layer.init(jax.random.key(1), x)
    out = layer.apply(params, x)
    W = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    pre = np.asarray(x) @ W + b
    expected = np.sin(pre) * np.exp(-0.5 * pre**2)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_modulator_shapes_and_relu():
    mod = Modulator(dim_hidden=32, num_layers=5)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16)), jnp.float32)
    params = mod.init(jax.random.key(0), z)
    outs = mod.apply(params, z)
    assert len(outs) == 5
    for o in outs:
        assert o.shape == (3, 32)
        assert (np.asarray(o) >= 0).all()  # ReLU outputs
    # latent re-concat: layer 1..4 kernels have input dim hidden+latent
    assert params["params"]["layer_0"]["kernel"].shape == (16, 32)
    assert params["params"]["layer_1"]["kernel"].shape == (48, 32)


def test_sirennet_modulation_applied():
    net = SirenNet(dim_hidden=16, dim_out=1, num_layers=2, dropout=0.0)
    coords = jnp.broadcast_to(coordinate_grid(8), (2, 64, 2))
    params = net.init(jax.random.key(0), coords)
    mods_one = tuple(jnp.ones((2, 16)) for _ in range(2))
    mods_zero = tuple(jnp.zeros((2, 16)) for _ in range(2))
    out_one = net.apply(params, coords, mods_one)
    out_none = net.apply(params, coords, None)
    out_zero = net.apply(params, coords, mods_zero)
    np.testing.assert_allclose(np.asarray(out_one), np.asarray(out_none), atol=1e-6)
    assert not np.allclose(np.asarray(out_zero), np.asarray(out_one))


def test_conv_encoder_shapes():
    enc = ConvEncoder(latent_dim=256)
    x = jnp.zeros((5, 32, 32))
    params = enc.init(jax.random.key(0), x)
    out = enc.apply(params, x)
    assert out.shape == (5, 256)
    # conv3 reduces 8x8 -> 1x1 so the flatten sees exactly 64 features
    assert params["params"]["fc"]["kernel"].shape == (64, 256)


def test_conv_autoencoder_roundtrip_shape():
    ae = ConvAutoencoder(latent_dim=64)
    x = jnp.zeros((2, 32, 32))
    params = ae.init(jax.random.key(0), x)
    out = ae.apply(params, x)
    assert out.shape == (2, 32, 32)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_adaptive_avg_pool():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    down = adaptive_avg_pool_2d(x, (2, 2))
    np.testing.assert_allclose(
        np.asarray(down)[0, :, :, 0], [[2.5, 4.5], [10.5, 12.5]]
    )
    up = adaptive_avg_pool_2d(jnp.ones((1, 1, 1, 3)), (7, 7))
    assert up.shape == (1, 7, 7, 3)
    np.testing.assert_allclose(np.asarray(up), 1.0)


@pytest.mark.slow
def test_vgg_encoder_shape():
    enc = VGGEncoder(latent_dim=128)
    x = jnp.zeros((2, 32, 32))
    params = enc.init(jax.random.key(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, 128)


def test_modulated_siren_forward():
    model = ModulatedSiren(
        dim_hidden=32, latent_dim=32, num_layers=3, dropout=0.1
    )
    tiles = jnp.asarray(
        np.random.default_rng(0).uniform(size=(4, 32, 32)), jnp.float32
    )
    params = model.init(jax.random.key(0), tiles)
    out = model.apply(params, tiles, deterministic=True)
    assert out.shape == (4, 24, 24)
    # deterministic: same output twice
    out2 = model.apply(params, tiles, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # training mode with dropout rng differs
    out3 = model.apply(
        params, tiles, deterministic=False, rngs={"dropout": jax.random.key(1)}
    )
    assert not np.allclose(np.asarray(out), np.asarray(out3))


def test_modulated_siren_batch_independence():
    """Each patch's output depends only on its own tile (no cross-batch
    leakage)."""
    model = ModulatedSiren(dim_hidden=16, latent_dim=16, num_layers=2, dropout=0.0)
    tiles = jnp.asarray(
        np.random.default_rng(0).uniform(size=(3, 32, 32)), jnp.float32
    )
    params = model.init(jax.random.key(0), tiles)
    full = model.apply(params, tiles)
    single = model.apply(params, tiles[1:2])
    np.testing.assert_allclose(
        np.asarray(full)[1], np.asarray(single)[0], atol=1e-5
    )


def test_residual_sirennet():
    """Residual ablation: skip connections around modulated sine blocks
    (README.md:27,41); deep stacks stay well-scaled and trainable."""
    rng = jax.random.key(5)
    coords = jnp.broadcast_to(coordinate_grid(8), (2, 64, 2))
    mods = tuple(jnp.ones((2, 32)) * 0.5 for _ in range(10))
    net = SirenNet(dim_hidden=32, num_layers=10, dropout=0.0, residual=True)
    params = net.init(rng, coords, mods)["params"]
    out = net.apply({"params": params}, coords, mods)
    assert out.shape == (2, 64, 1)
    assert np.isfinite(np.asarray(out)).all()
    # identical params, residual off => different function
    plain = SirenNet(dim_hidden=32, num_layers=10, dropout=0.0)
    out_plain = plain.apply({"params": params}, coords, mods)
    assert not np.allclose(np.asarray(out), np.asarray(out_plain))
    # gradients reach the first layer through 10 blocks
    g = jax.grad(
        lambda p: net.apply({"params": p}, coords, mods).sum()
    )(params)
    assert float(jnp.abs(g["layer_0"]["kernel"]).max()) > 0.0


def test_residual_modulated_siren_end_to_end():
    model = ModulatedSiren(
        dim_hidden=64, latent_dim=32, num_layers=6, dropout=0.0, residual=True
    )
    tiles = jnp.asarray(
        np.random.default_rng(0).uniform(size=(3, 32, 32)).astype(np.float32)
    )
    params = model.init(jax.random.key(0), tiles)["params"]
    out = model.apply({"params": params}, tiles, deterministic=True)
    assert out.shape == (3, 24, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_perceptual_v1_roundtrip_shapes():
    """3-stage perceptual AE (reference Autoencoder_v1/Encoder_v1,
    perceptual_encoder.py:155-204,368-394)."""
    from mri_inr_tpu.models import PerceptualAutoencoderV1, PerceptualEncoderV1

    imgs = jnp.asarray(
        np.random.default_rng(1).uniform(size=(2, 24, 24)).astype(np.float32)
    )
    ae = PerceptualAutoencoderV1()
    variables = ae.init(jax.random.key(0), imgs, train=False)
    out = ae.apply(variables, imgs, train=False)
    assert out.shape == (2, 24, 24)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    enc = PerceptualEncoderV1()
    zvars = enc.init(jax.random.key(0), imgs, train=False)
    z = enc.apply(zvars, imgs, train=False)
    assert z.shape == (2, 256)


@pytest.mark.slow
def test_vgg_autoencoder_roundtrip_and_splice():
    """VGG AE reconstructs patch-shaped output, and its pretrained trunk
    transplants into the SIREN's vgg encoder (VERDICT r1 item 5): after
    splicing, the encoder's trunk features equal the AE's encode()."""
    from mri_inr_tpu.models.encoder import VGGAutoencoder
    from mri_inr_tpu.train.trainer import splice_pretrained_encoder

    ae = VGGAutoencoder()
    x = jnp.asarray(
        np.random.default_rng(1).uniform(size=(2, 32, 32)), jnp.float32
    )
    ae_params = ae.init(jax.random.key(1), x)["params"]
    recon = ae.apply({"params": ae_params}, x)
    assert recon.shape == (2, 32, 32)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0

    model = ModulatedSiren(
        dim_hidden=32, latent_dim=32, num_layers=2, encoder_type="vgg"
    )
    params = model.init(jax.random.key(0), x)["params"]
    spliced = splice_pretrained_encoder(params, ae_params)
    got = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        spliced["encoder"]["encoder"]["trunk"],
        ae_params["trunk"],
    )
    assert all(jax.tree_util.tree_leaves(got))
    # fc head untouched (fresh init, like the reference's new Linear head)
    np.testing.assert_array_equal(
        np.asarray(spliced["encoder"]["encoder"]["fc"]["kernel"]),
        np.asarray(params["encoder"]["encoder"]["fc"]["kernel"]),
    )
    # the spliced model still runs end to end
    out = model.apply({"params": spliced}, x, deterministic=True)
    assert out.shape == (2, 24, 24)


@pytest.mark.slow
def test_vgg_autoencoder_trains():
    from mri_inr_tpu.models.encoder import VGGAutoencoder
    import optax

    ae = VGGAutoencoder()
    x = jnp.asarray(
        np.random.default_rng(2).uniform(size=(8, 32, 32)), jnp.float32
    )
    params = ae.init(jax.random.key(0), x)["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_of(p):
            return jnp.mean(jnp.square(ae.apply({"params": p}, x) - x))

        loss, grads = jax.value_and_grad(loss_of)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for _ in range(8):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first
