"""Kernel-only timing: argv = block_b streams."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from mri_inr_tpu.models.modulated_siren import ModulatedSiren, coordinate_grid
from mri_inr_tpu.ops import siren_kernel as sk

BATCH, ITERS = 4096, 10
BB, ST = int(sys.argv[1]), int(sys.argv[2])

model = ModulatedSiren(dim_hidden=256, latent_dim=256, num_layers=5,
                       dropout=0.1, compute_dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
tiles = jnp.asarray(rng.uniform(size=(BATCH, 32, 32)).astype(np.float32))
params = model.init(jax.random.key(0), tiles[:8])["params"]
kp = sk.extract_kernel_params(params, coordinate_grid(24))
latents = model.apply({"params": params}, tiles, method=model.encode).astype(jnp.float32)
latents = jax.block_until_ready(latents)

def body(c, i):
    out = sk.fused_siren_forward(kp, latents + i * 1e-6, block_b=BB, streams=ST)
    return c + out.mean(), None

run = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))[0])
t0 = time.perf_counter(); float(run())  # fetch-sync: block_until_ready lies through the axon relay
compile_s = time.perf_counter() - t0
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter(); float(run())  # fetch-sync: block_until_ready lies through the axon relay
    best = min(best, time.perf_counter() - t0)
print(f"kernel bb={BB} streams={ST}: {best/ITERS*1e3:.2f} ms/call "
      f"(compile {compile_s:.0f}s)", flush=True)
