"""Fused modulated-SIREN TRAINING step as Pallas TPU kernels (fwd + bwd).

Round-1 left training on the Flax autodiff path, which materializes every
(B, 576, 256) layer activation in HBM for the backward pass — at B=4096
that is ~15 GB of round-trip traffic per step, exactly the cost the fused
eval kernel (``ops/siren_kernel.py``) eliminates for inference. This module
gives the modulator+SIREN chain a ``jax.custom_vjp`` whose forward AND
backward are single Pallas kernels with all activations VMEM-resident:

- **Forward** (`_fwd_kernel`): the eval kernel's schedule plus in-kernel
  dropout. Dropout masks come from a counter-based integer hash (multiply +
  xorshift over a broadcasted iota), NOT ``pltpu.prng_*`` — the hash is (a)
  regenerable bit-identically in the backward kernel with zero storage, and
  (b) supported by interpret mode on CPU, so the grads-parity tests run
  everywhere. (The reference's dropout is torch ``nn.Dropout(p=0.1)`` after
  every hidden activation, ``src/networks/modulated_siren.py:146-156``; RNG
  streams obviously differ.)
- **Backward** (`_bwd_kernel`): rematerializes the forward chain in VMEM
  (storing the per-layer matmul *inputs* only, bf16), then walks the chain
  in reverse: 3 MXU matmuls per layer (pre-activation recompute, dW
  accumulation, dX propagation). Weight/bias/base gradients accumulate
  across batch blocks inside the kernel (TPU grids are sequential), so the
  only HBM gradient traffic is the (B, L*H) modulation grads + the (L, H,
  H) weight grads.

Everything OUTSIDE the chain — conv encoder, modulator MLP, the first
SIREN layer folded into ``base`` — stays on the XLA autodiff path: JAX
chains this op's (dmods, dbase, dW, ...) cotangents through
``compute_modulations`` / ``extract_kernel_params`` into the original Flax
parameter tree automatically.

Replaces the work the reference gets from cuDNN autograd in its hot loop
(``src/train/training.py:177-207``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mri_inr_tpu.ops.fast_math import fast_cos, fast_cos5, fast_sin, fast_sin5
from mri_inr_tpu.ops.siren_kernel import (
    SirenKernelParams,
    compute_modulations,
    extract_kernel_params,
    pallas_available,
)

# multiplicative-hash constants (Knuth/murmur-style; int32 wraparound is the
# point). _HASH_M is 0x9E3779B1 as a signed int32.
_HASH_M = -1640531535
_LAYER_STRIDE = 1315423911


def _keep_threshold(keep: float) -> int:
    """Signed-int32 threshold t with P(h < t) = keep for uniform int32 h."""
    return int(round(keep * 2.0**32 - 2.0**31))


def _wrap_i32(v: int) -> int:
    """Two's-complement wrap of a Python int to the int32 range (static
    hash offsets like layer*stride exceed 2**31 as Python ints)."""
    v %= 2**32
    return v - 2**32 if v >= 2**31 else v


def _sin_cos(sin5: bool):
    """(sin, cos) implementation pair: degree-9 default, degree-5 speed
    mode (``training.sin5`` — saves 2 polynomial FMAs per element in BOTH
    the fwd sine and the bwd cosine derivative)."""
    return (fast_sin5, fast_cos5) if sin5 else (fast_sin, fast_cos)


def _sine_pair(w0: float, sin5: bool = False):
    """(act, dact) for the sine activation — the OUTPUT layer always uses
    this, even for Morlet models (the reference's last Siren is built
    without an activation argument and defaults to Sine,
    modulated_siren.py:211-213)."""
    sin, cos = _sin_cos(sin5)

    def act(p):
        return sin(p if w0 == 1.0 else w0 * p)

    def dact(p):
        return w0 * cos(p if w0 == 1.0 else w0 * p)

    return act, dact


def _act_pair(w0: float, activation: str, sin5: bool = False):
    """(act, dact): hidden-layer activation and its derivative wrt the
    pre-activation."""
    sin, cos = _sin_cos(sin5)

    if activation == "morlet":

        def act(p):
            return sin(w0 * p) * jnp.exp(-0.5 * jnp.square(p))

        def dact(p):
            env = jnp.exp(-0.5 * jnp.square(p))
            return env * (w0 * cos(w0 * p) - p * sin(w0 * p))

    else:

        def act(p):
            return sin(p if w0 == 1.0 else w0 * p)

        def dact(p):
            return w0 * cos(p if w0 == 1.0 else w0 * p)

    return act, dact


def _dropout_mask(idx, seed_i, layer: int, keep: float):
    """(n, hidden) f32 mask of {0, 1/keep}: counter-based hash, identical
    between forward and backward kernels (zero mask storage)."""
    off = seed_i + _wrap_i32(layer * _LAYER_STRIDE)
    h = (idx + off) * _HASH_M
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return jnp.where(h < _keep_threshold(keep), 1.0 / keep, 0.0)


def _elem_iota(n: int, hidden: int, pid):
    """Globally-unique int32 element ids for this block (wraparound ok).

    ``rows + pid*n`` is the global (batch_row*seq + s) index, so the id —
    and therefore the dropout mask — is independent of the block size; the
    forward (block_b) and backward (bwd_block_b) kernels regenerate
    identical masks."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, hidden), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, hidden), 1)
    return (rows + pid * n) * hidden + cols


def _fwd_kernel(
    seed_ref,
    mods_ref,
    base_ref,
    sw_ref,
    sb_ref,
    lw_ref,
    lb_ref,
    out_ref,
    *,
    num_layers: int,
    w0: float,
    activation: str,
    rate: float,
    sin5: bool = False,
):
    """One batch-block training forward: eval schedule + dropout masks."""
    tb = mods_ref.shape[0]
    seq, hidden = base_ref.shape
    n = tb * seq
    mm_dtype = sw_ref.dtype
    act, _ = _act_pair(w0, activation, sin5)
    act_last, _ = _sine_pair(w0, sin5)
    keep = 1.0 - rate

    if rate > 0.0:
        seed_i = seed_ref[0].astype(jnp.int32)
        idx = _elem_iota(n, hidden, pl.program_id(0))

        def drop(x3, layer):
            return x3 * _dropout_mask(idx, seed_i, layer, keep).reshape(
                tb, seq, hidden
            )

    else:

        def drop(x3, layer):
            return x3

    def mod_rows(layer):
        r = jax.lax.slice(
            mods_ref[:], (0, layer * hidden), (tb, (layer + 1) * hidden)
        )
        return r.reshape(tb, 1, hidden)

    base = base_ref[:].reshape(1, seq, hidden)
    x3 = drop(jnp.broadcast_to(base, (tb, seq, hidden)), 0) * mod_rows(0)
    x = x3.reshape(n, hidden).astype(mm_dtype)

    for i in range(num_layers - 1):
        pre = jnp.dot(x, sw_ref[i], preferred_element_type=jnp.float32)
        s3 = act((pre + sb_ref[i]).reshape(tb, seq, hidden))
        x3 = drop(s3, i + 1) * mod_rows(i + 1)
        x = x3.reshape(n, hidden).astype(mm_dtype)

    r = jnp.sum(x.astype(jnp.float32) * lw_ref[:], axis=-1).reshape(tb, seq)
    out_ref[:] = act_last(r + lb_ref[0, 0])


def _bwd_kernel(
    seed_ref,
    mods_ref,
    base_ref,
    sw_ref,
    sb_ref,
    lw_ref,
    lb_ref,
    g_ref,
    dmods_ref,
    dbase_ref,
    dsw_ref,
    dsb_ref,
    dlw_ref,
    dlb_ref,
    x_scratch,
    *,
    num_layers: int,
    w0: float,
    activation: str,
    rate: float,
    sin5: bool = False,
    dw_partials: bool = False,
):
    """One batch-block backward: rematerialized forward (storing per-layer
    matmul inputs in VMEM scratch) + reverse sweep. Weight-space grads
    accumulate across blocks (constant-index output blocks; TPU grid
    iterations are sequential) — except with ``dw_partials``, where each
    block WRITES its dW/dsb/dlw/dlb partial to its own output block (no
    read-modify-write of a resident accumulator; XLA reduces the partials
    outside the kernel). dbase stays accumulated either way: per-block
    (seq, hidden) partials would cost grid x 590 KB of HBM for a cheap
    VMEM add."""
    tb = mods_ref.shape[0]
    seq, hidden = base_ref.shape
    n = tb * seq
    mm_dtype = sw_ref.dtype
    act, dact = _act_pair(w0, activation, sin5)
    _, dact_last = _sine_pair(w0, sin5)
    keep = 1.0 - rate

    if rate > 0.0:
        seed_i = seed_ref[0].astype(jnp.int32)
        idx = _elem_iota(n, hidden, pl.program_id(0))

        def drop(x3, layer):
            return x3 * _dropout_mask(idx, seed_i, layer, keep).reshape(
                tb, seq, hidden
            )

    else:

        def drop(x3, layer):
            return x3

    def mod_rows(layer):
        r = jax.lax.slice(
            mods_ref[:], (0, layer * hidden), (tb, (layer + 1) * hidden)
        )
        return r.reshape(tb, 1, hidden)

    if dw_partials:

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dbase_ref[:] = jnp.zeros_like(dbase_ref)

        # own output block per grid step: plain stores, no accumulation
        def acc_sw(i, v):
            dsw_ref[0, i] = v

        def acc_sb(i, v):
            dsb_ref[0, i] = jnp.broadcast_to(v, dsb_ref.shape[2:])

        def acc_lw(v):
            dlw_ref[0] = jnp.broadcast_to(v, dlw_ref.shape[1:])

        def acc_lb(v):
            dlb_ref[0] = jnp.full(dlb_ref.shape[1:], v, dlb_ref.dtype)

    else:

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dbase_ref[:] = jnp.zeros_like(dbase_ref)
            dsw_ref[:] = jnp.zeros_like(dsw_ref)
            dsb_ref[:] = jnp.zeros_like(dsb_ref)
            dlw_ref[:] = jnp.zeros_like(dlw_ref)
            dlb_ref[:] = jnp.zeros_like(dlb_ref)

        def acc_sw(i, v):
            dsw_ref[i] += v

        def acc_sb(i, v):
            dsb_ref[i] += jnp.broadcast_to(v, dsb_ref.shape[1:])

        def acc_lw(v):
            dlw_ref[:] += jnp.broadcast_to(v, dlw_ref.shape)

        def acc_lb(v):
            dlb_ref[:] += v

    # ---- rematerialized forward, storing layer inputs x_0..x_{L-1} ----
    base = base_ref[:].reshape(1, seq, hidden)
    b3 = drop(jnp.broadcast_to(base, (tb, seq, hidden)), 0)
    x3 = b3 * mod_rows(0)
    x_scratch[0] = x3.reshape(n, hidden).astype(mm_dtype)

    for i in range(num_layers - 1):
        pre = jnp.dot(
            x_scratch[i], sw_ref[i], preferred_element_type=jnp.float32
        )
        s3 = act((pre + sb_ref[i]).reshape(tb, seq, hidden))
        x3 = drop(s3, i + 1) * mod_rows(i + 1)
        x_scratch[i + 1] = x3.reshape(n, hidden).astype(mm_dtype)

    # ---- last layer backward, entirely in (n, 1) column layout ----
    # Mosaic rejects shape casts that move the lane dimension ((tb, seq) ->
    # (1, n) or [:, :, None]); g arrives pre-reshaped as an (n, 1) column
    # block and the per-position scalars stay (n, 1) throughout — lane
    # splats ((n,1)*(n,h)) and dim-0 contractions are all layout-preserving.
    x_last = x_scratch[num_layers - 1][:].astype(jnp.float32)
    r = jnp.sum(x_last * lw_ref[:], axis=-1, keepdims=True)  # (n, 1)
    pre_last = r + lb_ref[0, 0]
    g = g_ref[:]  # (n, 1)
    dpre_last = g * dact_last(pre_last)  # (n, 1)

    acc_lw(
        jax.lax.dot_general(
            dpre_last,
            x_last,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    acc_lb(jnp.sum(dpre_last))

    # dX for the last projection: lane-splat of the column against the
    # (1, H) weight row
    dx3 = (dpre_last * lw_ref[:]).reshape(tb, seq, hidden)

    dms = [None] * num_layers
    for i in range(num_layers - 2, -1, -1):
        # recompute pre_{i+1} and its activation (the stored x_{i+1} is
        # post-dropout*mod; dm and dpre need the pieces separately)
        pre = (
            jnp.dot(x_scratch[i], sw_ref[i], preferred_element_type=jnp.float32)
            + sb_ref[i]
        ).reshape(tb, seq, hidden)
        d3 = drop(act(pre), i + 1)  # dropped activation (pre-modulation)
        dms[i + 1] = jnp.sum(dx3 * d3, axis=1)  # (tb, hidden)
        dpre = drop(dx3 * mod_rows(i + 1), i + 1) * dact(pre)
        dpre_f = dpre.reshape(n, hidden)
        dpre_m = dpre_f.astype(mm_dtype)

        acc_sw(
            i,
            jax.lax.dot_general(
                x_scratch[i][:],
                dpre_m,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
        )
        acc_sb(i, jnp.sum(dpre_f, axis=0, keepdims=True))
        dx3 = jax.lax.dot_general(
            dpre_m,
            sw_ref[i],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(tb, seq, hidden)

    # ---- layer 0: grads for mod_0 and the shared base ----
    dms[0] = jnp.sum(dx3 * b3, axis=1)
    dbase_ref[:] += jnp.sum(drop(dx3 * mod_rows(0), 0), axis=0)

    dmods_ref[:] = jnp.concatenate(dms, axis=1)


@functools.lru_cache(maxsize=None)
def _make_chain(
    num_layers: int,
    w0: float,
    activation: str,
    rate: float,
    block_b: int,
    bwd_block_b: int,
    interpret: bool,
    sin5: bool = False,
    dw_partials: bool = False,
):
    """Build the custom_vjp chain op for one static configuration."""

    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    smem_seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    num_l = num_layers - 1

    def fwd_call(mods, base, s_w, s_b, last_w, last_b, seed):
        padded = mods.shape[0]
        seq, hidden = base.shape
        grid = (padded // block_b,)
        return pl.pallas_call(
            functools.partial(
                _fwd_kernel,
                num_layers=num_layers,
                w0=w0,
                activation=activation,
                rate=rate,
                sin5=sin5,
            ),
            out_shape=jax.ShapeDtypeStruct((padded, seq), jnp.float32),
            grid=grid,
            in_specs=[
                smem_seed,
                pl.BlockSpec(
                    (block_b, num_layers * hidden),
                    lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                full(seq, hidden),
                full(num_l, hidden, hidden),
                full(num_l, 1, hidden),
                full(1, hidden),
                full(1, 1),
            ],
            out_specs=pl.BlockSpec(
                (block_b, seq), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * padded * seq * hidden * hidden * num_l,
                bytes_accessed=padded * (num_layers * hidden + seq) * 4
                + num_l * hidden * hidden * 2,
                transcendentals=padded * seq * hidden * num_l,
            ),
            # sine fits the 16 MB default scoped-vmem budget; the Morlet
            # activation's exp+sin+square temporaries (plus the dropout
            # hash) do not (measured: hard-table morlet row, r5) — same
            # raised cap as the eval/bwd kernels
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(seed, mods, base, s_w, s_b, last_w, last_b)

    def bwd_call(mods, base, s_w, s_b, last_w, last_b, seed, g):
        padded = mods.shape[0]
        seq, hidden = base.shape
        tb = bwd_block_b
        nblocks = padded // tb
        grid = (nblocks,)
        n = tb * seq
        dmods_shape = jax.ShapeDtypeStruct(
            (padded, num_layers * hidden), jnp.float32
        )
        dmods_spec = pl.BlockSpec(
            (tb, num_layers * hidden), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        )
        if dw_partials:
            # one output block per grid step; XLA reduces outside
            out_shapes = (
                dmods_shape,
                jax.ShapeDtypeStruct((seq, hidden), jnp.float32),
                jax.ShapeDtypeStruct(
                    (nblocks, num_l, hidden, hidden), jnp.float32
                ),
                jax.ShapeDtypeStruct((nblocks, num_l, 8, hidden), jnp.float32),
                jax.ShapeDtypeStruct((nblocks, 8, hidden), jnp.float32),
                jax.ShapeDtypeStruct((nblocks, 8, 128), jnp.float32),
            )
            out_specs = (
                dmods_spec,
                full(seq, hidden),
                pl.BlockSpec(
                    (1, num_l, hidden, hidden),
                    lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, num_l, 8, hidden),
                    lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 8, hidden), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 8, 128), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            )
        else:
            out_shapes = (
                dmods_shape,
                jax.ShapeDtypeStruct((seq, hidden), jnp.float32),
                jax.ShapeDtypeStruct((num_l, hidden, hidden), jnp.float32),
                jax.ShapeDtypeStruct((num_l, 8, hidden), jnp.float32),
                jax.ShapeDtypeStruct((8, hidden), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )
            out_specs = (
                dmods_spec,
                full(seq, hidden),
                full(num_l, hidden, hidden),
                full(num_l, 8, hidden),
                full(8, hidden),
                full(8, 128),
            )
        dmods, dbase, dsw, dsb8, dlw8, dlb8 = pl.pallas_call(
            functools.partial(
                _bwd_kernel,
                num_layers=num_layers,
                w0=w0,
                activation=activation,
                rate=rate,
                sin5=sin5,
                dw_partials=dw_partials,
            ),
            out_shape=out_shapes,
            grid=grid,
            in_specs=[
                smem_seed,
                pl.BlockSpec(
                    (tb, num_layers * hidden),
                    lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                full(seq, hidden),
                full(num_l, hidden, hidden),
                full(num_l, 1, hidden),
                full(1, hidden),
                full(1, 1),
                # g as an (n, 1) column so the kernel's last-layer backward
                # stays in lane-preserving layout (see _bwd_kernel)
                pl.BlockSpec(
                    (n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((num_layers, n, hidden), s_w.dtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=8 * padded * seq * hidden * hidden * num_l,
                bytes_accessed=padded * (2 * num_layers * hidden + seq) * 4
                + 3 * num_l * hidden * hidden * 4,
                transcendentals=3 * padded * seq * hidden * num_l,
            ),
            # the rematerialized chain + reverse-sweep temporaries exceed the
            # 16 MB default scoped-vmem budget (~60 MB at block 8); the v5e
            # core has 128 MB of physical VMEM — raise the cap (127 MB; the
            # full 128 leaves Mosaic no headroom) instead of shrinking the
            # block below Mosaic's 8-sublane minimum
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024
            ),
            interpret=interpret,
        )(seed, mods, base, s_w, s_b, last_w, last_b,
          g.reshape(padded * seq, 1))
        if dw_partials:
            dsw = dsw.sum(axis=0)
            dsb8 = dsb8.sum(axis=0)
            dlw8 = dlw8.sum(axis=0)
            dlb8 = dlb8.sum(axis=0)
        return (
            dmods,
            dbase,
            dsw.astype(s_w.dtype),
            dsb8[:, :1, :],
            dlw8[:1, :],
            dlb8[:1, :1],
        )

    @jax.custom_vjp
    def chain(mods, base, s_w, s_b, last_w, last_b, seed):
        return fwd_call(mods, base, s_w, s_b, last_w, last_b, seed)

    def chain_fwd(mods, base, s_w, s_b, last_w, last_b, seed):
        out = fwd_call(mods, base, s_w, s_b, last_w, last_b, seed)
        return out, (mods, base, s_w, s_b, last_w, last_b, seed)

    def chain_bwd(res, g):
        mods, base, s_w, s_b, last_w, last_b, seed = res
        dmods, dbase, dsw, dsb, dlw, dlb = bwd_call(
            mods, base, s_w, s_b, last_w, last_b, seed, g
        )
        return dmods, dbase, dsw, dsb, dlw, dlb, jnp.zeros_like(seed)

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


def siren_chain_train(
    kp: SirenKernelParams,
    mods: jax.Array,
    seed: jax.Array,
    *,
    num_layers: int = 5,
    w0: float = 1.0,
    activation: str = "sine",
    dropout_rate: float = 0.0,
    block_b: int = 8,
    bwd_block_b: int = 16,
    interpret: bool = False,
    sin5: bool = False,
    dw_partials: bool = True,
) -> jax.Array:
    """(B, L*H) modulations -> (B, S) outputs; differentiable wrt ``mods``
    and the chain weights in ``kp`` via the fused Pallas fwd/bwd pair.

    ``seed``: (1,) float32 dropout seed (integer-valued; float so the
    custom_vjp cotangent is a plain zero array). Batch is padded to the
    block size internally; pad/slice autodiff feeds zero cotangents for the
    padding rows, which contribute exact zeros to every weight gradient.
    """
    import math

    batch = mods.shape[0]
    step = math.lcm(block_b, bwd_block_b)
    padded = -(-batch // step) * step
    if padded != batch:
        mods = jnp.pad(mods, ((0, padded - batch), (0, 0)))
    chain = _make_chain(
        num_layers,
        w0,
        activation,
        float(dropout_rate),
        block_b,
        bwd_block_b,
        interpret,
        sin5,
        dw_partials,
    )
    out = chain(mods, kp.base, kp.s_w, kp.s_b, kp.last_w, kp.last_b, seed)
    return out[:batch]


def fused_train_apply(
    model,
    params,
    tiles: jax.Array,
    dropout_rng: jax.Array,
    *,
    deterministic: bool = False,
    block_b: int = 8,
    bwd_block_b: int | None = None,
    interpret: bool = False,
    mm_dtype: jnp.dtype = jnp.bfloat16,
    sin5: bool = False,
    dw_partials: bool = True,
) -> jax.Array:
    """Differentiable flagship forward for the TRAIN step: XLA conv encoder
    + modulator (autodiff) -> fused Pallas SIREN chain (custom_vjp) ->
    (B, siren, siren). Drop-in for
    ``model.apply({'params': params}, tiles, deterministic=False, ...)``
    up to dropout RNG streams (in-kernel hash vs Flax threefry)."""
    from mri_inr_tpu.models.modulated_siren import coordinate_grid

    latent = model.apply({"params": params}, tiles, method=model.encode)
    coords = coordinate_grid(model.siren_patch_size)
    kp = extract_kernel_params(
        params,
        coords,
        num_layers=model.num_layers,
        w0=model.w0,
        w0_initial=model.w0_initial,
        activation=model.activation,
        mm_dtype=mm_dtype,
    )
    mods = compute_modulations(kp, latent.astype(jnp.float32), num_layers=model.num_layers)
    rate = 0.0 if deterministic else float(model.dropout)
    if bwd_block_b is None:
        # block 16 (the r5 sine default) + Morlet's fatter VPU temporaries
        # exceeds the core's 128 MB physical VMEM (measured 130.3 MB,
        # hard-table morlet row) — Morlet keeps the r4 block 8 schedule
        bwd_block_b = 8 if model.activation == "morlet" else 16
    seed = jax.random.randint(dropout_rng, (1,), 0, 2**23).astype(jnp.float32)
    out = siren_chain_train(
        kp,
        mods,
        seed,
        num_layers=model.num_layers,
        w0=model.w0,
        activation=model.activation,
        dropout_rate=rate,
        block_b=block_b,
        bwd_block_b=bwd_block_b,
        interpret=interpret,
        sin5=sin5,
        dw_partials=dw_partials,
    )
    s = model.siren_patch_size
    return out.reshape(tiles.shape[0], s, s)
