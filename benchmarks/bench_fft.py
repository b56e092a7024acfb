"""MXU-DFT kernel vs jnp.fft on the real chip (fastMRI volume shapes)."""
import time
import jax, jax.numpy as jnp, numpy as np
from mri_inr_tpu.data import kspace
from mri_inr_tpu.ops import fft_kernel

S, H, W = 16, 640, 368
rng = np.random.default_rng(0)
ri = jnp.asarray(rng.normal(size=(S, H, W, 2)).astype(np.float32))
ITERS = 20

def timeit(name, fn):
    def body(c, i):
        return c + fn(ri + i * 1e-6).mean(), None
    run = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))[0])
    t0 = time.perf_counter(); float(run())  # fetch-sync: block_until_ready lies through the axon relay
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run())  # fetch-sync: block_until_ready lies through the axon relay
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1e3
    print(f"{name}: {ms:.3f} ms/volume ({S/(ms/1e3):.0f} slices/s) "
          f"(compile {compile_s:.0f}s)", flush=True)

timeit("jnp.fft ifft2c+abs", kspace.reconstruct_magnitude_ri)
timeit("pallas MXU-DFT    ", fft_kernel.reconstruct_magnitude_ri_mxu)
