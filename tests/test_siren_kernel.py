"""Fused Pallas SIREN kernel vs the Flax reference path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU — covered by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_inr_tpu.models.modulated_siren import ModulatedSiren, coordinate_grid
from mri_inr_tpu.ops import siren_kernel


def _model(**kw):
    defaults = dict(
        dim_hidden=256, latent_dim=256, num_layers=5, dropout=0.0,
        compute_dtype=jnp.float32,
    )
    defaults.update(kw)
    return ModulatedSiren(**defaults)


@pytest.fixture(scope="module")
def setup():
    model = _model()
    tiles = jnp.asarray(
        np.random.default_rng(3).uniform(size=(9, 32, 32)).astype(np.float32)
    )
    params = model.init(jax.random.key(0), tiles)["params"]
    return model, params, tiles


def test_fused_matches_flax(setup):
    model, params, tiles = setup
    ref = model.apply({"params": params}, tiles, deterministic=True)
    out = siren_kernel.fused_forward(model, params, tiles, interpret=True)
    assert out.shape == ref.shape == (9, 24, 24)
    # kernel runs bf16 matmuls / f32 accumulation; flax path here is f32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)
    # and it should be much closer than bf16 resolution of the output scale
    assert float(jnp.abs(out - ref).mean()) < 3e-3


def test_fused_matches_flax_bf16(setup):
    """Against the bf16 flax path the kernel agrees to bf16 resolution."""
    _, params, tiles = setup
    model_bf16 = _model(compute_dtype=jnp.bfloat16)
    ref = model_bf16.apply({"params": params}, tiles, deterministic=True)
    out = siren_kernel.fused_forward(model_bf16, params, tiles, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref, dtype=np.float32), atol=2e-2
    )


def test_fused_morlet(setup):
    _, params, tiles = setup
    model = _model(activation="morlet")
    ref = model.apply({"params": params}, tiles, deterministic=True)
    out = siren_kernel.fused_forward(model, params, tiles, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_batch_padding(setup):
    """Batch sizes that are not multiples of block_b round-trip exactly."""
    model, params, tiles = setup
    out_full = siren_kernel.fused_forward(
        model, params, tiles, block_b=4, interpret=True
    )
    out_small = siren_kernel.fused_forward(
        model, params, tiles[:5], block_b=4, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_small), np.asarray(out_full[:5]), atol=1e-6
    )


def test_extract_kernel_params_shapes(setup):
    model, params, _ = setup
    kp = siren_kernel.extract_kernel_params(
        params["net"] and params, coordinate_grid(24)
    )
    assert kp.base.shape == (576, 256)
    assert kp.mh_w.shape == (4, 256, 256)
    assert kp.mz_w.shape == (4, 256, 256)
    assert kp.s_w.shape == (4, 256, 256)
    assert kp.last_w.shape == (1, 256)


def test_int8_matches_flax(setup):
    """int8 MXU path: quantization noise well below bf16 resolution."""
    model, params, tiles = setup
    ref = model.apply({"params": params}, tiles, deterministic=True)
    out = siren_kernel.fused_forward(
        model, params, tiles, interpret=True, quantized=True
    )
    assert out.shape == ref.shape
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 5e-3
    assert np.sqrt((err**2).mean()) < 1e-3


def test_int8_batch_padding(setup):
    model, params, tiles = setup
    out_full = siren_kernel.fused_forward(
        model, params, tiles, block_b=4, interpret=True, quantized=True
    )
    out_small = siren_kernel.fused_forward(
        model, params, tiles[:5], block_b=4, interpret=True, quantized=True
    )
    np.testing.assert_allclose(
        np.asarray(out_small), np.asarray(out_full[:5]), atol=1e-6
    )


def test_ksplit_schedule_matches(setup):
    """The K-decomposed cross-phase pipeline (`ksplit=2`) computes the same
    function as the monolithic schedule (only the matmul accumulation order
    differs)."""
    model, params, tiles = setup
    ref = model.apply({"params": params}, tiles, deterministic=True)
    for ks in (2,):
        out = siren_kernel.fused_forward(
            model, params, tiles, interpret=True, ksplit=ks
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)
        assert float(jnp.abs(out - ref).mean()) < 3e-3


def test_ksplit_with_morlet_and_streams(setup):
    _, params, tiles = setup
    model = _model(activation="morlet")
    ref = model.apply({"params": params}, tiles, deterministic=True)
    out = siren_kernel.fused_forward(model, params, tiles, interpret=True,
                                     ksplit=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_sin_bf16_schedule_matches(setup):
    """The packed-bf16 sine epilogue (`sin_bf16`) stays within the bf16
    noise envelope of the standard schedule."""
    from mri_inr_tpu.models.modulated_siren import coordinate_grid

    model, params, tiles = setup
    latent = model.apply({"params": params}, tiles, method=model.encode)
    kp = siren_kernel.extract_kernel_params(params, coordinate_grid(24))
    ref = siren_kernel.fused_siren_forward(
        kp, latent.astype(jnp.float32), interpret=True, sin7=True
    )
    out = siren_kernel.fused_siren_forward(
        kp, latent.astype(jnp.float32), interpret=True, sin_bf16=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)
