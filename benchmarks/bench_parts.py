"""Component timing: one variant per process (argv[1])."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from mri_inr_tpu.models.modulated_siren import ModulatedSiren, coordinate_grid
from mri_inr_tpu.ops import siren_kernel as sk

BATCH, ITERS = 4096, 10
VARIANT = sys.argv[1]

model = ModulatedSiren(dim_hidden=256, latent_dim=256, num_layers=5,
                       dropout=0.1, compute_dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
tiles = jnp.asarray(rng.uniform(size=(BATCH, 32, 32)).astype(np.float32))
params = model.init(jax.random.key(0), tiles[:8])["params"]
kp = sk.extract_kernel_params(params, coordinate_grid(24))
latents = model.apply({"params": params}, tiles, method=model.encode).astype(jnp.float32)
latents = jax.block_until_ready(latents)

def timeit(name, fn):
    run = jax.jit(lambda: jax.lax.scan(fn, jnp.float32(0), jnp.arange(ITERS))[0])
    t0 = time.perf_counter(); float(run())  # fetch-sync: block_until_ready lies through the axon relay
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run())  # fetch-sync: block_until_ready lies through the axon relay
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/ITERS*1e3:.2f} ms/call (compile {compile_s:.0f}s)", flush=True)

if VARIANT == "encoder":
    def body(c, i):
        out = model.apply({"params": params}, tiles + i * 1e-6, method=model.encode)
        return c + out.astype(jnp.float32).mean(), None
    timeit("encoder only", body)
else:
    bb = int(VARIANT)
    def body(c, i):
        out = sk.fused_siren_forward(kp, latents + i * 1e-6, block_b=bb)
        return c + out.mean(), None
    timeit(f"fused kernel only (block_b={bb})", body)
