"""Fused Pallas TRAINING kernel (custom_vjp fwd+bwd) vs the Flax autodiff
path and a pure-jnp twin (interpret mode on CPU; the same kernels compile
via Mosaic on TPU — covered by benchmarks/bench_train.py).

The parity contract (VERDICT r1 item 2): gradients through the fused chain
must match the Flax path. With dropout off and f32 matmuls the only
difference is fast_cos vs the autodiff derivative of fast_sin (~5e-5
envelope); with dropout on, the kernel's hash masks are validated against
a jnp twin that regenerates the identical masks.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from mri_inr_tpu.models.modulated_siren import ModulatedSiren, coordinate_grid
from mri_inr_tpu.ops import siren_train_kernel as stk
from mri_inr_tpu.ops.fast_math import fast_sin
from mri_inr_tpu.ops.siren_kernel import compute_modulations, extract_kernel_params

HID = 64


def _model(**kw):
    defaults = dict(
        dim_hidden=HID, latent_dim=32, num_layers=5, dropout=0.0,
        compute_dtype=jnp.float32,
    )
    defaults.update(kw)
    return ModulatedSiren(**defaults)


@pytest.fixture(scope="module")
def setup():
    model = _model()
    tiles = jnp.asarray(
        np.random.default_rng(3).uniform(size=(16, 32, 32)).astype(np.float32)
    )
    params = model.init(jax.random.key(0), tiles[:2])["params"]
    return model, params, tiles


def test_fwd_matches_flax(setup):
    model, params, tiles = setup
    key = jax.random.key(7)
    ref = model.apply(
        {"params": params}, tiles, deterministic=False, rngs={"dropout": key}
    )
    out = stk.fused_train_apply(
        model, params, tiles, key, interpret=True, mm_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_grads_match_flax(setup):
    model, params, tiles = setup
    key = jax.random.key(7)
    target = jnp.asarray(
        np.random.default_rng(5).uniform(size=(16, 24, 24)).astype(np.float32)
    )

    def loss_flax(p):
        pred = model.apply(
            {"params": p}, tiles, deterministic=False, rngs={"dropout": key}
        )
        return jnp.mean((pred - target) ** 2)

    def loss_fused(p):
        pred = stk.fused_train_apply(
            model, p, tiles, key, interpret=True, mm_dtype=jnp.float32
        )
        return jnp.mean((pred - target) ** 2)

    g1, _ = jax.flatten_util.ravel_pytree(jax.grad(loss_flax)(params))
    g2, _ = jax.flatten_util.ravel_pytree(jax.grad(loss_fused)(params))
    scale = float(jnp.abs(g1).max())
    assert float(jnp.abs(g1 - g2).max()) < 1e-4 * max(scale, 1.0)


def _twin_setup(setup, rate):
    model, params, tiles = setup
    coords = coordinate_grid(24)
    kp = extract_kernel_params(params, coords, mm_dtype=jnp.float32)
    latent = model.apply({"params": params}, tiles, method=model.encode)
    mods = compute_modulations(kp, latent)
    batch, (seq, hid) = mods.shape[0], kp.base.shape
    keep = 1.0 - rate

    def mask(layer, seed_int):
        n = batch * seq
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, hid), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, hid), 1)
        idx = rows * hid + cols
        off = jnp.int32(seed_int) + stk._wrap_i32(layer * stk._LAYER_STRIDE)
        h = (idx + off) * stk._HASH_M
        h = h ^ jax.lax.shift_right_logical(h, 16)
        return jnp.where(
            h < stk._keep_threshold(keep), 1.0 / keep, 0.0
        ).reshape(batch, seq, hid)

    def twin(m, seed_int):
        mm = m.reshape(batch, 5, hid)
        x = (kp.base[None] * mask(0, seed_int)) * mm[:, 0, None, :]
        for i in range(4):
            pre = jnp.einsum("bsh,hk->bsk", x, kp.s_w[i]) + kp.s_b[i][None]
            x = (fast_sin(pre) * mask(i + 1, seed_int)) * mm[:, i + 1, None, :]
        r = jnp.sum(x * kp.last_w[0][None, None], axis=-1) + kp.last_b[0, 0]
        return fast_sin(r)

    return kp, mods, twin


def test_dropout_grads_match_twin(setup):
    """With dropout ON: the fwd (block_b=8) and bwd (block_b=4) kernels
    regenerate identical masks, matching a jnp twin exactly."""
    kp, mods, twin = _twin_setup(setup, rate=0.1)
    seed = jnp.array([12345.0], jnp.float32)
    w = jnp.cos(jnp.arange(mods.shape[0] * 576, dtype=jnp.float32)).reshape(
        mods.shape[0], 576
    )

    out_k = stk.siren_chain_train(kp, mods, seed, dropout_rate=0.1, interpret=True)
    out_t = twin(mods, 12345)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_t), atol=1e-6)

    g_k = jax.grad(lambda m: jnp.sum(
        stk.siren_chain_train(kp, m, seed, dropout_rate=0.1, interpret=True) * w
    ))(mods)
    g_t = jax.grad(lambda m: jnp.sum(twin(m, 12345) * w))(mods)
    scale = float(jnp.abs(g_t).max())
    assert float(jnp.abs(g_k - g_t).max()) < 1e-4 * max(scale, 1.0)


def test_dropout_statistics_and_determinism(setup):
    kp, mods, _ = _twin_setup(setup, rate=0.1)
    s1 = jnp.array([111.0], jnp.float32)
    s2 = jnp.array([112.0], jnp.float32)
    o1 = stk.siren_chain_train(kp, mods, s1, dropout_rate=0.1, interpret=True)
    o2 = stk.siren_chain_train(kp, mods, s2, dropout_rate=0.1, interpret=True)
    o3 = stk.siren_chain_train(kp, mods, s1, dropout_rate=0.1, interpret=True)
    assert bool(jnp.any(o1 != o2))
    assert bool(jnp.all(o1 == o3))

    # keep-rate of the hash mask itself
    idx = stk._elem_iota(4096, 256, jnp.int32(0))
    m = stk._dropout_mask(idx, jnp.int32(999), 2, 0.9)
    assert abs(float((m > 0).mean()) - 0.9) < 2e-3


def test_weight_grads_flow_through_chain(setup):
    """dW/db/dbase cotangents reach the original Flax tree: grads wrt the
    SIREN layer weights are nonzero and match the Flax path."""
    model, params, tiles = setup
    key = jax.random.key(3)

    def loss_fused(p):
        pred = stk.fused_train_apply(
            model, p, tiles, key, interpret=True, mm_dtype=jnp.float32
        )
        return jnp.mean(pred**2)

    g = jax.grad(loss_fused)(params)
    for name in ("layer_0", "layer_2", "last_layer"):
        assert float(jnp.abs(g["net"][name]["kernel"]).max()) > 0
        assert float(jnp.abs(g["net"][name]["bias"]).max()) > 0
    assert float(jnp.abs(g["modulator"]["layer_1"]["kernel"]).max()) > 0
    assert float(jnp.abs(g["encoder"]["encoder"]["conv1"]["kernel"]).max()) > 0


def test_morlet_grads(setup):
    model_m = _model(activation="morlet")
    _, params, tiles = setup
    key = jax.random.key(11)

    def loss_flax(p):
        pred = model_m.apply(
            {"params": p}, tiles, deterministic=False, rngs={"dropout": key}
        )
        return jnp.mean(pred**2)

    def loss_fused(p):
        pred = stk.fused_train_apply(
            model_m, p, tiles, key, interpret=True, mm_dtype=jnp.float32
        )
        return jnp.mean(pred**2)

    g1, _ = jax.flatten_util.ravel_pytree(jax.grad(loss_flax)(params))
    g2, _ = jax.flatten_util.ravel_pytree(jax.grad(loss_fused)(params))
    scale = float(jnp.abs(g1).max())
    assert float(jnp.abs(g1 - g2).max()) < 2e-4 * max(scale, 1.0)


def test_sin5_train_mode(setup):
    """Degree-5 train speed mode (training.sin5): forward matches a
    fast_sin5 jnp twin tightly; gradients track the twin's autodiff within
    the cos5-vs-poly-derivative envelope (each approximates cos to ~7e-3;
    their pointwise difference bounds the grad gap)."""
    from mri_inr_tpu.ops.fast_math import fast_sin5

    model, params, tiles = setup
    coords = coordinate_grid(24)
    kp = extract_kernel_params(params, coords, mm_dtype=jnp.float32)
    latent = model.apply({"params": params}, tiles, method=model.encode)
    mods = compute_modulations(kp, latent)
    seed = jnp.zeros((1,), jnp.float32)

    def twin(m):
        batch, (seq, hid) = m.shape[0], kp.base.shape
        mm = m.reshape(batch, 5, hid)
        x = kp.base[None] * mm[:, 0, None, :]
        for i in range(4):
            pre = jnp.einsum("bsh,hk->bsk", x, kp.s_w[i]) + kp.s_b[i][None]
            x = fast_sin5(pre) * mm[:, i + 1, None, :]
        r = jnp.sum(x * kp.last_w[0][None, None], axis=-1) + kp.last_b[0, 0]
        return fast_sin5(r)

    out_k = stk.siren_chain_train(kp, mods, seed, interpret=True, sin5=True)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(twin(mods)), atol=1e-5
    )
    # degree-5 differs from degree-9 by the polynomial error envelope
    out9 = stk.siren_chain_train(kp, mods, seed, interpret=True)
    assert 1e-5 < float(jnp.abs(out_k - out9).max()) < 5e-2

    g_k = jax.grad(lambda m: jnp.mean(
        stk.siren_chain_train(kp, m, seed, interpret=True, sin5=True) ** 2
    ))(mods)
    g_t = jax.grad(lambda m: jnp.mean(twin(m) ** 2))(mods)
    scale = float(jnp.abs(g_t).max())
    assert float(jnp.abs(g_k - g_t).max()) < 3e-2 * max(scale, 1.0)


def test_morlet_sin5_grads(setup):
    """activation=morlet with the degree-5 train kernels (the promoted
    training.sin5 default) — fwd matches a degree-5 jnp twin and grads
    stay within the cos5 envelope (Morlet uses sin AND cos in dact)."""
    from mri_inr_tpu.ops.fast_math import fast_sin5

    model_m = _model(activation="morlet")
    _, params, tiles = setup
    coords = coordinate_grid(24)
    kp = extract_kernel_params(
        params, coords, mm_dtype=jnp.float32, activation="morlet"
    )
    latent = model_m.apply({"params": params}, tiles, method=model_m.encode)
    mods = compute_modulations(kp, latent)
    seed = jnp.zeros((1,), jnp.float32)

    def twin(m):
        batch, (seq, hid) = m.shape[0], kp.base.shape
        mm = m.reshape(batch, 5, hid)
        x = kp.base[None] * mm[:, 0, None, :]
        for i in range(4):
            pre = jnp.einsum("bsh,hk->bsk", x, kp.s_w[i]) + kp.s_b[i][None]
            act = fast_sin5(pre) * jnp.exp(-0.5 * jnp.square(pre))
            x = act * mm[:, i + 1, None, :]
        r = jnp.sum(x * kp.last_w[0][None, None], axis=-1) + kp.last_b[0, 0]
        return fast_sin5(r)  # output layer is always Sine

    out_k = stk.siren_chain_train(
        kp, mods, seed, activation="morlet", interpret=True, sin5=True
    )
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(twin(mods)), atol=1e-5
    )
    g_k = jax.grad(lambda m: jnp.mean(
        stk.siren_chain_train(
            kp, m, seed, activation="morlet", interpret=True, sin5=True
        ) ** 2
    ))(mods)
    g_t = jax.grad(lambda m: jnp.mean(twin(m) ** 2))(mods)
    scale = float(jnp.abs(g_t).max())
    assert float(jnp.abs(g_k - g_t).max()) < 3e-2 * max(scale, 1.0)


def test_dw_partials_grads_match_accumulate(setup):
    """The per-block-dW backward variant (round-5 schedule experiment:
    each grid step writes its own dW/dsb/dlw/dlb partial block, reduced by
    XLA outside the kernel) must produce the same gradients as the
    in-kernel accumulation mode — with dropout ON and a block-misaligned
    batch so pad rows and mask regeneration are both exercised."""
    model_d = _model(dropout=0.1)
    tiles = jnp.asarray(
        np.random.default_rng(11).uniform(size=(13, 32, 32)).astype(np.float32)
    )
    params = model_d.init(jax.random.key(1), tiles[:2])["params"]
    key = jax.random.key(5)

    def loss(p, dwp):
        pred = stk.fused_train_apply(
            model_d, p, tiles, key, interpret=True, mm_dtype=jnp.float32,
            dw_partials=dwp,
        )
        return jnp.mean(pred**2)

    g0, _ = jax.flatten_util.ravel_pytree(
        jax.grad(lambda p: loss(p, False))(params)
    )
    g1, _ = jax.flatten_util.ravel_pytree(
        jax.grad(lambda p: loss(p, True))(params)
    )
    # identical math, different reduction order: f32 reassociation only
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-6)
