"""Platform selection that survives site-level PJRT plugin registration.

Some environments register a TPU PJRT plugin from ``sitecustomize`` and call
``jax.config.update("jax_platforms", ...)`` at interpreter start, which
silently overrides the ``JAX_PLATFORMS`` environment variable. Calling
:func:`apply_platform_env` before the first backend use re-asserts the
user's choice (needed for CPU-mesh testing and CI)."""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    try:
        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except RuntimeError:
        pass  # backends already initialized; too late to switch
