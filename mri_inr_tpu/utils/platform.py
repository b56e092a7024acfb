"""Platform selection helper for CLI entry points.

The container's sitecustomize registers the TPU plugin at interpreter
startup and pins ``JAX_PLATFORMS``; env vars set later are ignored. CLIs
therefore expose ``--platform {tpu,cpu}`` and route through here, which
uses ``jax.config.update`` (effective until the first backend use).
"""

from __future__ import annotations


def select_platform(platform: str | None, num_devices: int | None = None) -> None:
    """platform: None (leave default), "cpu", or "tpu". ``num_devices``
    (CPU only) creates a virtual multi-device platform — the mesh/sharding
    paths (e.g. ``EvalConfig.halo_fold``) are drivable without a pod."""
    if not platform or platform == "tpu":
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
