"""Platform selection that survives site-level PJRT plugin registration.

Some environments register a TPU PJRT plugin from ``sitecustomize`` and call
``jax.config.update("jax_platforms", ...)`` at interpreter start, which
silently overrides the ``JAX_PLATFORMS`` environment variable. Calling
:func:`apply_platform_env` before the first backend use re-asserts the
user's choice (needed for CPU-mesh testing and CI).

Also enables JAX's persistent compilation cache (measured to work through
remote-compile tunnels: a cached SDXL forward re-loads in seconds instead
of recompiling for minutes). Opt out with ``VCD_XLA_CACHE=0`` or point it
elsewhere with ``VCD_XLA_CACHE_DIR``."""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    ".xla_cache",
)


def apply_platform_env() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    import jax

    if env:
        try:
            if jax.config.jax_platforms != env:
                jax.config.update("jax_platforms", env)
        except RuntimeError:
            pass  # backends already initialized; too late to switch

    if os.environ.get("VCD_XLA_CACHE", "1") != "0":
        try:
            cache_dir = os.environ.get(
                "VCD_XLA_CACHE_DIR", _DEFAULT_CACHE_DIR
            )
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            # only persist compiles worth the disk/serialization cost
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2.0
            )
        except Exception:  # noqa: BLE001 — older jax without the knobs
            pass
