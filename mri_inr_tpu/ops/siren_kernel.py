"""Fused modulated-SIREN forward as a single Pallas TPU kernel.

The hot path of the reference model (``src/networks/modulated_siren.py:
215-233,325-343``: Modulator MLP + 5-layer sine-activated SIREN with
per-layer FiLM modulation) is, per patch, a chain of small matmuls over a
(576, 256) activation. On TPU the XLA path materializes the (B, 576, 256)
activation in HBM between layers — at B=4096 that is ~1.2 GB per layer
crossing, which makes the chain HBM-bound (~19 GB of traffic vs ~8 ms of
MXU work). This kernel keeps the whole chain VMEM-resident: it reads only
the (L, B, 256) precomputed modulations + weights and writes the (B, 576)
outputs.

Structure exploited:
- The first SIREN layer ``sin(w0_init*(coords @ W0 + b0))`` is
  batch-independent (fixed coordinate grid) -> precomputed once outside
  the kernel as ``base`` (S, H).
- FiLM modulation ``x *= mod[b]`` is a per-row-block column scaling, so the
  per-patch (S, H) @ (H, H) matmuls stack into one (TB*S, H) @ (H, H)
  MXU-friendly matmul per layer per batch-block.
- The modulator MLP runs OUTSIDE the kernel (:func:`compute_modulations`)
  as full-batch XLA matmuls: inside a batch-block its (TB, H) @ (H, H)
  matmuls would occupy the MXU at TB/128 efficiency and serialize the
  layer chain (mod_i depends on mod_{i-1}); hoisted, they are one
  MXU-saturating (B, H) @ (H, H) per layer and the kernel's layers have
  no cross-layer scalar dependency beyond the activation itself. The
  ``concat([h, z]) @ W`` is split as ``h @ Wh + z @ Wz`` (no concat).
- Sine uses the same degree-9 polynomial as ``ops/fast_math.fast_sin``
  (|err| <= 5.9e-6), which the VPU overlaps with MXU work.

This kernel is the inference/eval path (deterministic, no dropout); the
TRAINING fwd+bwd pair with in-kernel dropout and a custom_vjp lives in
``ops/siren_train_kernel.py``. Parameters are consumed directly from the
Flax ``ModulatedSiren`` param pytree via :func:`extract_kernel_params`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mri_inr_tpu.ops.fast_math import (fast_sin, fast_sin5, fast_sin7,
                                       fast_sin7_bf16)


class SirenKernelParams(NamedTuple):
    """Weights repacked for the fused kernel (H = dim_hidden, L = layers).

    All matmul weights are bf16 (MXU input dtype), biases f32.
    """

    base: jax.Array  # (S, H) f32: sin(w0_init * (coords @ W0 + b0))
    m0_w: jax.Array  # (H, H) bf16: modulator layer 0
    m0_b: jax.Array  # (1, H) f32
    mh_w: jax.Array  # (L-1, H, H) bf16: modulator hidden-part weights
    mz_w: jax.Array  # (L-1, H, H) bf16: modulator latent-part weights
    m_b: jax.Array  # (L-1, 1, H) f32
    s_w: jax.Array  # (L-1, H, H) bf16: SIREN hidden layers 1..L-1
    s_b: jax.Array  # (L-1, 1, H) f32
    last_w: jax.Array  # (1, H) f32: final projection (transposed)
    last_b: jax.Array  # (1, 1) f32


def _poly_sin(x: jax.Array) -> jax.Array:
    return fast_sin(x)


def extract_kernel_params(
    params,
    coords: jax.Array,
    *,
    num_layers: int = 5,
    w0: float = 1.0,
    w0_initial: float = 30.0,
    activation: str = "sine",
    mm_dtype: jnp.dtype = jnp.bfloat16,
) -> SirenKernelParams:
    """Repack a Flax ``ModulatedSiren`` param tree (its ``net`` +
    ``modulator`` collections) for the fused kernel.

    ``coords``: (S, 2) fixed coordinate grid. ``mm_dtype`` is the matmul
    input dtype (bf16 for the MXU; f32 for tight-parity tests). All ops
    here are differentiable jnp — the training path backprops through this
    repacking into the original Flax param tree.
    """
    net = params["net"]
    mod = params["modulator"]
    l0 = net["layer_0"]
    pre0 = coords.astype(jnp.float32) @ l0["kernel"].astype(jnp.float32)
    pre0 = pre0 + l0["bias"].astype(jnp.float32)
    base = jnp.sin(w0_initial * pre0)
    if activation == "morlet":
        base = base * jnp.exp(-0.5 * jnp.square(pre0))

    hidden = net["layer_1"]["kernel"].shape[0]
    latent = mod["layer_0"]["kernel"].shape[0]

    mh_w, mz_w, m_b, s_w, s_b = [], [], [], [], []
    for i in range(1, num_layers):
        mw = mod[f"layer_{i}"]["kernel"]  # (hidden + latent, H)
        mh_w.append(mw[:hidden])
        mz_w.append(mw[hidden : hidden + latent])
        m_b.append(mod[f"layer_{i}"]["bias"][None, :])
        s_w.append(net[f"layer_{i}"]["kernel"])
        s_b.append(net[f"layer_{i}"]["bias"][None, :])

    bf = lambda xs: jnp.stack(xs).astype(mm_dtype)
    f32 = lambda xs: jnp.stack(xs).astype(jnp.float32)
    return SirenKernelParams(
        base=base.astype(jnp.float32),
        m0_w=mod["layer_0"]["kernel"].astype(mm_dtype),
        m0_b=mod["layer_0"]["bias"][None, :].astype(jnp.float32),
        mh_w=bf(mh_w),
        mz_w=bf(mz_w),
        m_b=f32(m_b),
        s_w=bf(s_w),
        s_b=f32(s_b),
        last_w=net["last_layer"]["kernel"][:, 0][None, :].astype(jnp.float32),
        last_b=net["last_layer"]["bias"].reshape(1, 1).astype(jnp.float32),
    )


def compute_modulations(
    kp: SirenKernelParams, latents: jax.Array, *, num_layers: int = 5
) -> jax.Array:
    """(B, latent) -> (L, B, H) f32 FiLM modulations.

    The modulator MLP runs here, OUTSIDE the Pallas kernel, as full-batch
    XLA matmuls: inside a batch-block its (TB, H) @ (H, H) matmuls would
    occupy the MXU at TB/128 efficiency and serialize the layer chain
    (mod_i depends on mod_{i-1}); hoisted, each layer is one
    MXU-saturating (B, H) @ (H, H) and the kernel's layers keep no
    cross-layer dependency beyond the activation itself.
    relu(concat(m, z) @ W) == relu(m@Wh + z@Wz + b) — no concat needed.
    """
    mm_dtype = kp.m0_w.dtype
    z = latents.astype(mm_dtype)
    m = jnp.dot(z, kp.m0_w, preferred_element_type=jnp.float32)
    m = jnp.maximum(m + kp.m0_b, 0.0)
    mods = [m]
    for i in range(num_layers - 1):
        mh = jnp.dot(
            m.astype(mm_dtype), kp.mh_w[i], preferred_element_type=jnp.float32
        )
        mz = jnp.dot(z, kp.mz_w[i], preferred_element_type=jnp.float32)
        m = jnp.maximum(mh + mz + kp.m_b[i], 0.0)
        mods.append(m)
    # (B, L*H): one contiguous lane-aligned DMA per batch-block in the kernel
    return jnp.concatenate(mods, axis=1)


def _kernel(
    mods_ref,
    base_ref,
    sw_ref,
    sb_ref,
    lb_ref,
    out_ref,
    *,
    num_layers: int,
    w0: float,
    activation: str,
    streams: int,
    sin7: bool = False,
    sin_bf16: bool = False,
    sin5: bool = False,
    ksplit: int = 1,
):
    """One batch-block forward over precomputed modulations.

    The caller (:func:`fused_siren_forward`) pre-multiplies the LAST
    layer's modulation block by the final projection weights, so the
    kernel's epilogue is ``sin(sum_h(act * modproj) + b)`` — the separate
    FiLM multiply, bf16 round-trip, and projection-weight multiply of the
    final layer collapse into the one multiply that was needed anyway.

    ``streams=2`` splits the block's stacked activation into independent
    row-halves and interleaves their layer chains — the sine polynomial
    (VPU) of one stream overlaps the matmul (MXU) of the other.
    ``ksplit=k`` instead pipelines WITHIN the chain: each hidden layer's
    input activation is produced in k column slices, and slice j's matmul
    contribution (MXU) is issued before slice j+1's sine+FiLM epilogue
    (VPU) — cross-phase overlap without data independence, exploiting
    matmul K-decomposition ``x @ W = sum_j x[:, j] @ W[j, :]``.
    ``sin7`` selects the degree-7 polynomial (|err| 2.6e-4, still 15x
    under bf16 resolution). ``sin_bf16`` evaluates the polynomial tail +
    FiLM multiply in bf16 (packed-VPU; ~1e-2 absolute activation error,
    see fast_math.fast_sin7_bf16)."""
    tb = mods_ref.shape[0]
    seq, hidden = base_ref.shape
    if sin5:
        sin = fast_sin5
    elif sin_bf16:
        sin = fast_sin7_bf16
    elif sin7:
        sin = fast_sin7
    else:
        sin = _poly_sin

    def act(pre):
        out = sin(pre if w0 == 1.0 else w0 * pre)
        if activation == "morlet":
            out = out * jnp.exp(-0.5 * jnp.square(pre))
        return out

    # SIREN layer 0 output (precomputed base), modulated per patch; activations
    # held in bf16 (matmul input dtype) — accumulation stays f32 per matmul.
    # Mixed slice+newaxis indexing lowers to a gather Mosaic rejects, so
    # stream rows are cut with lax.slice and broadcast via reshape.
    sub = tb // streams
    hk = hidden // ksplit

    def mod_cols(layer, s, k, width=None):
        """(sub, 1, width) slice of stream s's modulations for ``layer``,
        columns [k*hk, k*hk + width) (width defaults to hk)."""
        width = hk if width is None else width
        rows = jax.lax.slice(
            mods_ref[:],
            (s * sub, layer * hidden + k * hk),
            ((s + 1) * sub, layer * hidden + k * hk + width),
        )
        return rows.reshape(sub, 1, width)

    def mod_rows(layer, s):
        return mod_cols(layer, s, 0, width=hidden)

    base = base_ref[:].reshape(1, seq, hidden)
    xs = [
        (base * mod_rows(0, s)).reshape(sub * seq, hidden).astype(jnp.bfloat16)
        for s in range(streams)
    ]

    # with the bf16 polynomial the FiLM multiply also runs in bf16 (its
    # f32 product would immediately be cast down for the next matmul)
    mod_dtype = jnp.bfloat16 if sin_bf16 else jnp.float32

    # hidden layers 1..L-2: matmul + sine + FiLM, keeping the result as the
    # next matmul's bf16 input. The LAST hidden layer (L-1) is peeled off
    # below: its epilogue feeds the projection reduction directly in f32.
    pres = [
        jnp.dot(x, sw_ref[0], preferred_element_type=jnp.float32) for x in xs
    ]
    for i in range(num_layers - 2):
        if ksplit == 1:
            xs = [
                (
                    act(pre + sb_ref[i]).reshape(sub, seq, hidden)
                    * mod_rows(i + 1, s).astype(mod_dtype)
                )
                .reshape(sub * seq, hidden)
                .astype(jnp.bfloat16)
                for s, pre in enumerate(pres)
            ]
            pres = [
                jnp.dot(x, sw_ref[i + 1], preferred_element_type=jnp.float32)
                for x in xs
            ]
        else:
            # K-decomposed: produce the activation in column slices and
            # issue each slice's contribution to the NEXT matmul as soon
            # as it exists — slice j+1's VPU epilogue runs under slice j's
            # MXU matmul.
            nxt = []
            for s, pre in enumerate(pres):
                pre3 = pre.reshape(sub, seq, hidden)
                acc = None
                for k in range(ksplit):
                    cols = jax.lax.slice(
                        pre3, (0, 0, k * hk), (sub, seq, (k + 1) * hk)
                    )
                    bias = jax.lax.slice(
                        sb_ref[i], (0, k * hk), (1, (k + 1) * hk)
                    ).reshape(1, 1, hk)
                    a = (
                        act(cols + bias)
                        * mod_cols(i + 1, s, k).astype(mod_dtype)
                    ).reshape(sub * seq, hk).astype(jnp.bfloat16)
                    w_rows = jax.lax.slice(
                        sw_ref[i + 1], (k * hk, 0), ((k + 1) * hk, hidden)
                    )
                    part = jnp.dot(
                        a, w_rows, preferred_element_type=jnp.float32
                    )
                    acc = part if acc is None else acc + part
                nxt.append(acc)
            pres = nxt

    # final hidden layer epilogue + projection: modproj (= mod * last_w,
    # folded by the caller) multiplies the activation once, then an H -> 1
    # VPU reduction; then the output sine — ALWAYS Sine, even for Morlet
    # models (the reference's last Siren defaults to Sine,
    # modulated_siren.py:211-213). Single full-block store (Mosaic rejects
    # strided sub-block stores on the non-128-aligned 576-lane output);
    # the reduction and output sine stay fp32 (final image values).
    # output sine stays at degree >= 7 even in sin5 mode: it produces the
    # final image values and is one (tb, seq) tensor — negligible VPU cost
    sin_last = fast_sin7 if (sin7 or sin_bf16 or sin5) else _poly_sin
    act_last = lambda pre: sin_last(pre if w0 == 1.0 else w0 * pre)
    i_last = num_layers - 2
    outs = []
    for s, pre in enumerate(pres):
        pre3 = pre.reshape(sub, seq, hidden)
        r = None
        for k in range(ksplit):
            cols = jax.lax.slice(
                pre3, (0, 0, k * hk), (sub, seq, (k + 1) * hk)
            )
            bias = jax.lax.slice(
                sb_ref[i_last], (0, k * hk), (1, (k + 1) * hk)
            ).reshape(1, 1, hk)
            prod = act(cols + bias).astype(jnp.float32) * mod_cols(
                num_layers - 1, s, k
            )
            part = jnp.sum(prod, axis=-1)  # (sub, seq) f32
            r = part if r is None else r + part
        outs.append(act_last(r + lb_ref[0, 0]))
    out_ref[:] = outs[0] if streams == 1 else jnp.concatenate(outs, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_layers", "w0", "activation", "block_b", "interpret", "streams",
        "sin7", "sin_bf16", "sin5", "ksplit",
    ),
)
def fused_siren_forward(
    kp: SirenKernelParams,
    latents: jax.Array,
    *,
    num_layers: int = 5,
    w0: float = 1.0,
    activation: str = "sine",
    block_b: int = 8,
    interpret: bool = False,
    streams: int = 1,
    sin7: bool = False,
    sin_bf16: bool = False,
    sin5: bool = False,
    ksplit: int = 1,
) -> jax.Array:
    """(B, latent) latents -> (B, S) SIREN outputs, fully fused.

    B is padded to a multiple of ``block_b`` internally. ``streams`` splits
    each block into independent row groups whose layer chains interleave;
    must divide ``block_b``. Measured on v5e the single-stream schedule is
    fastest (Mosaic does not co-issue the streams' MXU/VPU phases), so 1
    is the default; the knob is kept for other TPU generations. ``ksplit``
    pipelines each layer's sine epilogue against the next matmul in
    column slices (see :func:`_kernel`); must divide the hidden width
    into lane-aligned (128x) slices.
    """
    batch = latents.shape[0]
    seq, hidden = kp.base.shape
    if block_b % streams:
        raise ValueError(f"{streams=} must divide {block_b=}")
    if hidden % ksplit or (ksplit > 1 and (hidden // ksplit) % 128):
        raise ValueError(f"{ksplit=} must cut hidden={hidden} into 128-multiples")
    padded = -(-batch // block_b) * block_b
    if padded != batch:
        latents = jnp.pad(latents, ((0, padded - batch), (0, 0)))

    # modulator MLP outside the kernel: full-batch MXU-saturating matmuls
    mods = compute_modulations(kp, latents, num_layers=num_layers)
    # fold the final projection weights into the last layer's modulations:
    # out = sum_h act_h * (mod_h * lw_h) — one multiply instead of the
    # kernel's FiLM multiply + bf16 round-trip + projection multiply
    mods = jnp.concatenate(
        [
            mods[:, : (num_layers - 1) * hidden],
            mods[:, (num_layers - 1) * hidden :] * kp.last_w,
        ],
        axis=1,
    )

    grid = (padded // block_b,)
    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    num_l = num_layers - 1
    flops_per_block = 2 * block_b * seq * hidden * hidden * num_l
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            num_layers=num_layers,
            w0=w0,
            activation=activation,
            streams=streams,
            sin7=sin7,
            sin_bf16=sin_bf16,
            sin5=sin5,
            ksplit=ksplit,
        ),
        out_shape=jax.ShapeDtypeStruct((padded, seq), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, num_layers * hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(seq, hidden),
            full(num_l, hidden, hidden),
            full(num_l, 1, hidden),
            full(1, 1),
        ],
        out_specs=pl.BlockSpec(
            (block_b, seq), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_block * grid[0],
            bytes_accessed=padded * (num_layers * hidden + seq) * 4
            + num_l * hidden * hidden * 2,
            transcendentals=padded * seq * hidden * num_l,
        ),
        # the sine chain fits the 16 MB default scoped-vmem budget, but the
        # MORLET activation's larger VPU working set (exp + sin + square
        # temporaries per element) measured 17.6 MB at block 16 / B=400
        # (hard-table morlet row, r5) — raise the cap like the train
        # kernel does; the v5e core has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        mods,
        kp.base,
        kp.s_w,
        kp.s_b,
        kp.last_b,
    )
    return out[:batch]


class Int8SirenParams(NamedTuple):
    """Weights repacked for the int8 MXU kernel (v5e: 394 int8 TOP/s vs
    197 bf16 TF/s). Weights are per-output-channel symmetric int8; the
    per-patch activation scales are dynamic, derived from the modulations
    (see :func:`compute_quant_factors`)."""

    base: jax.Array  # (S, H) f32: sin(w0_init * (coords @ W0 + b0))
    swq: jax.Array  # (L-1, H, H) int8: quantized SIREN hidden weights
    sw_scale: jax.Array  # (L-1, 1, H) f32: per-output-channel dequant scale
    s_b: jax.Array  # (L-1, 1, H) f32
    last_w: jax.Array  # (1, H) f32
    last_b: jax.Array  # (1, 1) f32


def quantize_kernel_params(
    params, kp: SirenKernelParams, *, num_layers: int = 5
) -> Int8SirenParams:
    """Per-output-channel symmetric int8 quantization of the SIREN hidden
    weights, from the f32 Flax params (not the bf16 copies in ``kp``)."""
    net = params["net"]
    w = jnp.stack(
        [net[f"layer_{i}"]["kernel"] for i in range(1, num_layers)]
    ).astype(jnp.float32)  # (L-1, H, H): (in, out) per layer
    scale = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0  # (L-1, 1, H)
    swq = jnp.round(w / scale).astype(jnp.int8)
    return Int8SirenParams(kp.base, swq, scale, kp.s_b, kp.last_w, kp.last_b)


def compute_quant_factors(
    kp: SirenKernelParams,
    ikp: Int8SirenParams,
    latents: jax.Array,
    *,
    num_layers: int = 5,
):
    """Per-patch dynamic activation quantization, folded into the
    modulations so the kernel pays no extra reduction:

    The layer-i matmul input is ``x = sin(pre) * m_i[b]`` with |sin| <= 1
    and m_i >= 0 (ReLU), so ``max|x| <= max_h m_i[b,h]`` exactly. With
    scale_i[b] = max_h m_i[b,h] / 127:
      fq_i[b,h] = m_i[b,h] / scale_i[b]   (quant: x_q = round(sin * fq))
      gd_i[b,h'] = scale_i[b] * sw_scale_i[h']  (dequant of the int32 acc)
      ls[b] = scale_{L-1}[b]              (final-layer dequant)

    Returns (fq (B, L*H), gd (B, (L-1)*H), ls (B, 128) — ls is
    lane-broadcast for a tile-aligned block DMA).
    """
    mods = compute_modulations(kp, latents, num_layers=num_layers)
    batch = mods.shape[0]
    hidden = ikp.base.shape[1]
    m = mods.reshape(batch, num_layers, hidden)
    scale = jnp.maximum(jnp.max(m, axis=2), 1e-12) / 127.0  # (B, L)
    fq = (m / scale[:, :, None]).reshape(batch, num_layers * hidden)
    gd = scale[:, : num_layers - 1, None] * ikp.sw_scale[:, 0, :][None]
    gd = gd.reshape(batch, (num_layers - 1) * hidden)
    ls = jnp.broadcast_to(scale[:, num_layers - 1 :], (batch, 128))
    return fq, gd, ls


def _kernel_int8(
    fq_ref,
    gd_ref,
    ls_ref,
    base_ref,
    swq_ref,
    sb_ref,
    lw_ref,
    lb_ref,
    out_ref,
    *,
    num_layers: int,
    w0: float,
    activation: str,
):
    """One batch-block forward with int8 matmuls (int32 accumulation) and
    f32 activations. Quant/dequant are single broadcast multiplies thanks
    to the factors precomputed by :func:`compute_quant_factors`."""
    tb = fq_ref.shape[0]
    seq, hidden = base_ref.shape

    def act(pre):
        out = _poly_sin(pre if w0 == 1.0 else w0 * pre)
        if activation == "morlet":
            out = out * jnp.exp(-0.5 * jnp.square(pre))
        return out

    def rows(ref, layer):  # (tb, 1, hidden) per-patch factor slice
        r = jax.lax.slice(
            ref[:], (0, layer * hidden), (tb, (layer + 1) * hidden)
        )
        return r.reshape(tb, 1, hidden)

    def quantize(s3, layer):  # f32 (tb, seq, hidden) -> int8 (tb*seq, hidden)
        q = jnp.floor(s3 * rows(fq_ref, layer) + 0.5)
        return q.reshape(tb * seq, hidden).astype(jnp.int8)

    base = base_ref[:].reshape(1, seq, hidden)
    xq = quantize(jnp.broadcast_to(base, (tb, seq, hidden)), 0)

    s3 = None
    for i in range(num_layers - 1):
        acc = jnp.dot(xq, swq_ref[i], preferred_element_type=jnp.int32)
        pre = (
            acc.astype(jnp.float32).reshape(tb, seq, hidden) * rows(gd_ref, i)
            + sb_ref[i].reshape(1, 1, hidden)
        )
        s3 = act(pre)
        if i < num_layers - 2:
            xq = quantize(s3, i + 1)

    # final layer: x = s * m_{L-1} = (s * fq_{L-1}) * ls; reduce H -> 1 on
    # the VPU, rescale per patch, then the output sine (always Sine, even
    # for Morlet models — reference modulated_siren.py:211-213)
    xlast = s3 * rows(fq_ref, num_layers - 1)
    r = jnp.sum(xlast * lw_ref[:].reshape(1, 1, hidden), axis=-1)  # (tb, seq)
    ls = jax.lax.slice(ls_ref[:], (0, 0), (tb, 1))  # (tb, 1)
    pre_last = r * ls + lb_ref[0, 0]
    out_ref[:] = _poly_sin(pre_last if w0 == 1.0 else w0 * pre_last)


@functools.partial(
    jax.jit,
    static_argnames=("num_layers", "w0", "activation", "block_b", "interpret"),
)
def fused_siren_forward_int8(
    kp: SirenKernelParams,
    ikp: Int8SirenParams,
    latents: jax.Array,
    *,
    num_layers: int = 5,
    w0: float = 1.0,
    activation: str = "sine",
    block_b: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """(B, latent) latents -> (B, S) SIREN outputs via int8 MXU matmuls.

    Quantization noise is ~1e-4 RMS (max ~5e-4 vs the f32 Flax path) —
    below bf16 resolution, so metrics are unaffected. NOT the default:
    on the current chip the fused kernel is VPU-bound on the sine
    polynomial, so halving MXU cost does not pay for the extra per-layer
    quantize rounds (measured 18.8 ms vs 11.0 ms bf16 at B=4096). Use on
    hardware with a higher int8:bf16 MXU ratio, or for large ``hidden``
    where the 4x-smaller resident weights relieve VMEM pressure."""
    batch = latents.shape[0]
    seq, hidden = kp.base.shape
    padded = -(-batch // block_b) * block_b
    if padded != batch:
        latents = jnp.pad(latents, ((0, padded - batch), (0, 0)))

    fq, gd, ls = compute_quant_factors(kp, ikp, latents, num_layers=num_layers)

    grid = (padded // block_b,)
    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    row_block = lambda width: pl.BlockSpec(
        (block_b, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    num_l = num_layers - 1
    out = pl.pallas_call(
        functools.partial(
            _kernel_int8, num_layers=num_layers, w0=w0, activation=activation
        ),
        out_shape=jax.ShapeDtypeStruct((padded, seq), jnp.float32),
        grid=grid,
        in_specs=[
            row_block(num_layers * hidden),
            row_block(num_l * hidden),
            row_block(128),
            full(seq, hidden),
            full(num_l, hidden, hidden),
            full(num_l, 1, hidden),
            full(1, hidden),
            full(1, 1),
        ],
        out_specs=row_block(seq),
        cost_estimate=pl.CostEstimate(
            flops=2 * padded * seq * hidden * hidden * num_l,
            bytes_accessed=padded * (2 * num_layers * hidden + seq) * 4
            + num_l * hidden * hidden,
            transcendentals=padded * seq * hidden * num_l,
        ),
        interpret=interpret,
    )(fq, gd, ls, ikp.base, ikp.swq, ikp.s_b, ikp.last_w, ikp.last_b)
    return out[:batch]


def pallas_available() -> bool:
    """True when the default backend can compile Mosaic kernels (any TPU
    flavor; the axon relay reports platform 'axon' but is a TPU)."""
    dev = jax.devices()[0]
    return dev.platform not in ("cpu", "gpu", "cuda", "rocm")


def make_apply_fn(model, params_unused=None, *, use_pallas: bool = True,
                  interpret: bool = False, block_b: int = 16,
                  quantized: bool = False, sin7: bool = True,
                  sin_bf16: bool = False, sin5: bool = False, ksplit: int = 1):
    """(params, tiles) -> (B, siren, siren) forward; the fused Pallas path
    when requested and supported, else the Flax path. Drop-in for eval/
    reconstruction call sites (``SliceReconstructor``). ``quantized``
    selects the int8-MXU kernel (eval speed mode). Residual-MLP models
    (``model.residual``) are not fused — they take the Flax path.

    The library default is ``sin5=False`` (bit-level degree-7 parity is
    the no-args behavior); the r4-promoted speed default lives in ONE
    place, ``EvalConfig.sin5 = True`` (as ``TrainingConfig.sin5`` does for
    the train kernel), and config-driven callers thread it through.
    ``sin5=True`` (degree-5 minimax sine) measured at 940-slice scale on
    the quality checkpoint: PSNR 28.0283 vs the degree-7 path's 28.0425
    (-0.014 dB, 1% of the 1.47 dB spread), SSIM +0.0014, NRMSE +0.0001 —
    quality-neutral within noise for ~7% kernel speed (8.41 vs 9.01
    ms/call, benchmarks/bench_sweep.py)."""
    if getattr(model, "residual", False):
        use_pallas = False
    if use_pallas and (interpret or pallas_available()):
        return functools.partial(
            _fused_apply, model, block_b=block_b, interpret=interpret,
            quantized=quantized, sin7=sin7, sin_bf16=sin_bf16, sin5=sin5,
            ksplit=ksplit,
        )
    return functools.partial(_flax_apply, model)


def _flax_apply(model, params, tiles):
    return model.apply({"params": params}, tiles, deterministic=True)


def _fused_apply(model, params, tiles, *, block_b, interpret,
                 quantized=False, sin7=True, sin_bf16=False, sin5=False,
                 ksplit=1):
    return fused_forward(
        model, params, tiles, block_b=block_b, interpret=interpret,
        quantized=quantized, sin7=sin7, sin_bf16=sin_bf16, sin5=sin5,
        ksplit=ksplit,
    )


def fused_forward(
    model,
    params,
    tiles: jax.Array,
    *,
    block_b: int = 8,
    interpret: bool = False,
    quantized: bool = False,
    sin7: bool = True,
    sin_bf16: bool = False,
    sin5: bool = False,
    ksplit: int = 1,
) -> jax.Array:
    """Full flagship forward: XLA conv encoder -> fused Pallas
    modulator+SIREN -> (B, siren, siren). Drop-in for
    ``model.apply({'params': params}, tiles, deterministic=True)``.

    (The conv encoder stays on the XLA path: measured with the relay's
    ~23.5 ms fixed round-trip subtracted it costs <=0.3 ms per 4096-patch
    batch; dense-GEMM and im2col reformulations both measured slower.)
    """
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
    )
    common = dict(
        num_layers=model.num_layers,
        w0=model.w0,
        activation=model.activation,
        block_b=block_b,
        interpret=interpret,
    )
    if quantized:
        # sin5 is deliberately NOT in this check: it is the ambient r4
        # default, so quantized runs would always warn spuriously (the
        # int8 kernel simply doesn't evaluate a sine polynomial tail).
        if sin_bf16 or ksplit != 1 or not sin7:
            import warnings

            warnings.warn(
                "quantized=True uses the int8 kernel, which has no "
                "sin7/sin_bf16/ksplit knobs — those settings are ignored",
                stacklevel=2,
            )
        ikp = quantize_kernel_params(params, kp, num_layers=model.num_layers)
        out = fused_siren_forward_int8(
            kp, ikp, latent.astype(jnp.float32), **common
        )
    else:
        out = fused_siren_forward(
            kp, latent.astype(jnp.float32), sin7=sin7, sin_bf16=sin_bf16,
            sin5=sin5, ksplit=ksplit, **common,
        )
    s = model.siren_patch_size
    return out.reshape(tiles.shape[0], s, s)
