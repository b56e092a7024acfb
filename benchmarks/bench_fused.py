"""Fused-kernel vs XLA forward timing on the real chip."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from mri_inr_tpu.models.modulated_siren import ModulatedSiren, coordinate_grid
from mri_inr_tpu.ops import siren_kernel as sk

BATCH, ITERS = 4096, 10
BLOCK = int(sys.argv[1]) if len(sys.argv) > 1 else 8

model = ModulatedSiren(dim_hidden=256, latent_dim=256, num_layers=5,
                       dropout=0.1, compute_dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
tiles = jnp.asarray(rng.uniform(size=(BATCH, 32, 32)).astype(np.float32))
params = model.init(jax.random.key(0), tiles[:8])["params"]

kp = sk.extract_kernel_params(params, coordinate_grid(24))

def fused_body(carry, i):
    x = tiles + i.astype(jnp.float32) * 1e-6
    latent = model.apply({"params": params}, x, method=model.encode)
    out = sk.fused_siren_forward(kp, latent.astype(jnp.float32), block_b=BLOCK)
    return carry + out.astype(jnp.float32).mean(), None

run = jax.jit(lambda: jax.lax.scan(fused_body, jnp.float32(0), jnp.arange(ITERS))[0])
t0 = time.perf_counter(); float(run())  # fetch-sync: block_until_ready lies through the axon relay
print(f"block_b={BLOCK} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter(); float(run())  # fetch-sync: block_until_ready lies through the axon relay
    best = min(best, time.perf_counter() - t0)
per_call = best / ITERS
print(f"fused block_b={BLOCK}: {per_call*1e3:.2f} ms/call -> "
      f"{BATCH*576/per_call:.3e} px/s (~{BATCH*3.77e8/per_call/1e12:.1f} TF/s)")
