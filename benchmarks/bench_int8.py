"""int8 vs bf16 fused kernel timing on the real chip."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from mri_inr_tpu.models.modulated_siren import ModulatedSiren, coordinate_grid
from mri_inr_tpu.ops import siren_kernel as sk

BATCH, ITERS, BB = 4096, 10, 8
model = ModulatedSiren(dim_hidden=256, latent_dim=256, num_layers=5,
                       dropout=0.1, compute_dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
tiles = jnp.asarray(rng.uniform(size=(BATCH, 32, 32)).astype(np.float32))
params = model.init(jax.random.key(0), tiles[:8])["params"]
kp = sk.extract_kernel_params(params, coordinate_grid(24))
ikp = sk.quantize_kernel_params(params, kp)
latents = model.apply({"params": params}, tiles, method=model.encode).astype(jnp.float32)
latents = jax.block_until_ready(latents)

def timeit(name, fn):
    def body(c, i):
        return c + fn(latents + i * 1e-6).mean(), None
    run = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))[0])
    t0 = time.perf_counter(); float(run())  # fetch-sync: block_until_ready lies through the axon relay
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run())  # fetch-sync: block_until_ready lies through the axon relay
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1e3
    px = BATCH * 24 * 24 / (ms / 1e3)
    print(f"{name}: {ms:.2f} ms/call  {px/1e6:.0f} Mpx/s (compile {compile_s:.0f}s)",
          flush=True)

timeit("bf16", lambda l: sk.fused_siren_forward(kp, l, block_b=BB))
timeit("int8", lambda l: sk.fused_siren_forward_int8(kp, ikp, l, block_b=BB))
