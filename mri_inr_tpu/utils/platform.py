"""Platform selection helper for CLI entry points.

The container's sitecustomize registers the TPU plugin at interpreter
startup and pins ``JAX_PLATFORMS``; env vars set later are ignored. CLIs
therefore expose ``--platform {tpu,cpu}`` and route through here, which
uses ``jax.config.update`` (effective until the first backend use).
"""

from __future__ import annotations


def select_platform(platform: str | None) -> None:
    """platform: None (leave default), "cpu", or "tpu"."""
    if not platform or platform == "tpu":
        return
    import jax

    jax.config.update("jax_platforms", platform)


def add_platform_arg(parser) -> None:
    parser.add_argument(
        "--platform",
        choices=["tpu", "cpu"],
        default=None,
        help="force a JAX platform (default: environment's, i.e. TPU)",
    )
