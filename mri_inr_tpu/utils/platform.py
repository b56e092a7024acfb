"""Platform selection helper for CLI entry points.

The container's sitecustomize registers the TPU plugin at interpreter
startup and pins ``JAX_PLATFORMS``; env vars set later are ignored. CLIs
therefore expose ``--platform {tpu,cpu}`` and route through here, which
uses ``jax.config.update`` (effective until the first backend use).
"""

from __future__ import annotations

import os
import pathlib


def enable_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at a repo-local directory
    (override with ``MRI_INR_TPU_JAX_CACHE``; set it empty to disable).

    The big compile in this framework is the device-resident scan-epoch
    training program (~15 min through the axon relay); ablation rows that
    share HLO with a previously-compiled config (e.g. the acceleration
    sweep rows, which differ only in data) load it in seconds instead.
    """
    cache_dir = os.environ.get(
        "MRI_INR_TPU_JAX_CACHE",
        str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"),
    )
    if not cache_dir:
        return
    import jax

    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def select_platform(platform: str | None, num_devices: int | None = None) -> None:
    """platform: None (leave default), "cpu", or "tpu". ``num_devices``
    (CPU only) creates a virtual multi-device platform — the mesh/sharding
    paths (e.g. ``EvalConfig.halo_fold``) are drivable without a pod."""
    if not platform or platform == "tpu":
        # TPU only: XLA:CPU AOT cache entries carry exact machine-feature
        # lists and reload with SIGILL-risk warnings; the win is the remote
        # TPU scan compile anyway. With platform=None the backend is
        # whatever the environment pinned (JAX_PLATFORMS, set by
        # sitecustomize) — only enable the cache when that is a TPU-ish
        # backend, not CPU (ADVICE r3).
        env = os.environ.get("JAX_PLATFORMS", "")
        if platform == "tpu" or any(
            p in ("tpu", "axon") for p in env.lower().split(",")
        ):
            enable_compilation_cache()
        elif not env:
            # no pin: resolve the backend (cheap here — the CLI is about
            # to initialize it anyway) and only cache for TPU-ish ones
            import jax

            if jax.default_backend() in ("tpu", "axon"):
                enable_compilation_cache()
        return
    import jax

    jax.config.update("jax_platforms", platform)
    if num_devices and platform == "cpu":
        jax.config.update("jax_num_cpu_devices", num_devices)


def add_platform_arg(parser) -> None:
    parser.add_argument(
        "--platform",
        choices=["tpu", "cpu"],
        default=None,
        help="force a JAX platform (default: environment's, i.e. TPU)",
    )
    parser.add_argument(
        "--devices",
        type=int,
        default=None,
        help="virtual device count (CPU only; exercises mesh paths)",
    )
