#!/usr/bin/env python
"""Train-step roofline attribution (VERDICT r3 item 6): where do the
63 ms @ B=4096 of the fused train step go?

Phases timed separately (each as its own jitted lax.scan over ITERS
iterations, fetch-synced — block_until_ready does not wait through the
axon relay):

  A. full fused train step (loss+grads+adam)        — the 63 ms
  B. fused chain fwd+bwd alone (custom_vjp pair on device-resident mods)
  C. chain fwd alone (the eval schedule + dropout)
  D. encoder+modulator fwd+bwd via XLA autodiff (loss on modulations)
  E. adam update alone (optax apply_updates on ready grads)

FLOP account per 32x32 patch (exact, from benchmarks/README.md):
  fwd: encoder 0.96 MF + modulator 1.18 MF + chain 302.0 MF (incl. the
       folded projection) = 304.4 MF
  bwd chain: 3 matmuls/layer (pre-act recompute, dW, dX) ~= 3x the chain
       fwd cost minus the first layer's dX (not needed) ~= 875 MF
  bwd encoder+modulator: ~2x their fwd ~= 4.3 MF
  total train ~= 1.18 GF/patch -> 4.85 TFLOP @ B=4096.

Reference hot loop being attributed: ``src/train/training.py:177-207``.
Usage: python benchmarks/bench_train_parts.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mri_inr_tpu.models.modulated_siren import ModulatedSiren, coordinate_grid
from mri_inr_tpu.ops import siren_kernel as sk
from mri_inr_tpu.ops import siren_train_kernel as stk
from mri_inr_tpu.train.losses import mse

BATCH, ITERS = 4096, 20

model = ModulatedSiren(dim_hidden=256, latent_dim=256, num_layers=5,
                       dropout=0.1, compute_dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
tiles = jnp.asarray(rng.uniform(size=(BATCH, 32, 32)).astype(np.float32))
target = jnp.asarray(rng.uniform(size=(BATCH, 24, 24)).astype(np.float32))
params = model.init(jax.random.key(0), tiles[:8])["params"]
kp = sk.extract_kernel_params(params, coordinate_grid(24))
mods = sk.compute_modulations(
    kp, model.apply({"params": params}, tiles, method=model.encode
                    ).astype(jnp.float32))
mods = jax.device_put(mods)
seed = jnp.ones((1,), jnp.float32)

tx = optax.adam(1e-4)
opt_state = tx.init(params)
grads_like = jax.tree.map(jnp.ones_like, params)


def timeit(name, body):
    run = jax.jit(
        lambda: jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))[0])
    t0 = time.perf_counter()
    float(run())
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run())
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1e3
    print(f"{name:<44} {ms:8.2f} ms  (compile {compile_s:.0f}s)", flush=True)
    return ms


# A. full fused train step
def full_step(c, i):
    def loss_of(p):
        pred = stk.fused_train_apply(
            model, p, tiles + i * 1e-6, jax.random.fold_in(jax.random.key(0), 0))
        return mse(pred.astype(jnp.float32), target)

    loss, grads = jax.value_and_grad(loss_of)(params)
    upd, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, upd)
    return c + loss + jax.tree.leaves(new)[0].ravel()[0].astype(jnp.float32), None


# B. fused chain fwd+bwd alone (device-resident mods; grads wrt mods+weights)
def chain_fwd_bwd(c, i):
    def loss_of(m, base, s_w, s_b, lw, lb):
        kp2 = kp._replace(base=base, s_w=s_w, s_b=s_b, last_w=lw, last_b=lb)
        out = stk.siren_chain_train(kp2, m + i * 1e-6, seed, dropout_rate=0.1)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    loss, gs = jax.value_and_grad(loss_of, argnums=(0, 1, 2, 3, 4, 5))(
        mods, kp.base, kp.s_w, kp.s_b, kp.last_w, kp.last_b)
    return c + loss + gs[0].ravel()[0], None


# C. chain fwd alone
def chain_fwd(c, i):
    out = stk.siren_chain_train(kp, mods + i * 1e-6, seed, dropout_rate=0.1)
    return c + out.astype(jnp.float32).mean(), None


# D. encoder+modulator fwd+bwd (XLA autodiff tail)
def tail_fwd_bwd(c, i):
    def loss_of(p):
        kp2 = sk.extract_kernel_params(p, coordinate_grid(24))
        latent = model.apply({"params": p}, tiles + i * 1e-6,
                             method=model.encode)
        m = sk.compute_modulations(kp2, latent.astype(jnp.float32))
        return jnp.mean(m**2)

    loss, grads = jax.value_and_grad(loss_of)(params)
    return c + loss + jax.tree.leaves(grads)[0].ravel()[0].astype(jnp.float32), None


# E. adam update alone
def adam_only(c, i):
    gs = jax.tree.map(lambda g: g + i * 1e-6, grads_like)
    upd, _ = tx.update(gs, opt_state, params)
    new = optax.apply_updates(params, upd)
    return c + jax.tree.leaves(new)[0].ravel()[0].astype(jnp.float32), None


def main():
    print(f"device: {jax.devices()[0]}  batch={BATCH}", flush=True)
    a = timeit("A full fused train step", full_step)
    b = timeit("B chain fwd+bwd (custom_vjp pair)", chain_fwd_bwd)
    cc = timeit("C chain fwd alone", chain_fwd)
    d = timeit("D encoder+modulator fwd+bwd (XLA tail)", tail_fwd_bwd)
    e = timeit("E adam update alone", adam_only)
    print(f"\nB-C = chain bwd kernel       {b - cc:8.2f} ms", flush=True)
    print(f"A-(B+D+E) = composition gap  {a - b - d - e:8.2f} ms", flush=True)
    tf = 4.85 / (a / 1e3)
    print(f"step arithmetic: ~4.85 TFLOP -> {tf:.0f} TF/s bf16 "
          f"({tf / 197 * 100:.0f}% of v5e peak)", flush=True)
    import json
    print("PARTS " + json.dumps({
        "full_step_ms": round(a, 2), "chain_fwd_bwd_ms": round(b, 2),
        "chain_fwd_ms": round(cc, 2), "tail_fwd_bwd_ms": round(d, 2),
        "adam_ms": round(e, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
