"""Per-channel activation statistics, computed in-graph on device.

These replace the reference's synchronous ``.detach().cpu()`` hook metrics
(src/tracking/monitor.py:56-80) with XLA-fused reductions whose results stay
on device until the monitor's track interval. Inputs are NHWC; "channel"
means the last axis. All statistics are computed in float32.

Metric semantics match the reference exactly:
- mean_abs_activation_per_channel: |x| averaged over batch+spatial -> (C,)
  (torch: tensor.abs().mean(dim=[0, 2, 3]), monitor.py:66)
- mean_activation: scalar mean (monitor.py:73)
- std_activation: scalar std with ddof=1 (torch tensor.std() is unbiased,
  monitor.py:75)
- zero_fraction_per_channel: extra TPU-native metric — fraction of
  |x| < 1e-8 per channel (not in the reference; free side-output)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def mean_abs_activation_per_channel(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    return jnp.mean(jnp.abs(xf), axis=axes)


def mean_activation(x: jax.Array) -> jax.Array:
    return jnp.mean(x.astype(jnp.float32))


def std_activation(x: jax.Array) -> jax.Array:
    return jnp.std(x.astype(jnp.float32), ddof=1)


def zero_fraction_per_channel(x: jax.Array, tol: float = 1e-8) -> jax.Array:
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    return jnp.mean((jnp.abs(xf) < tol).astype(jnp.float32), axis=axes)


def full_activation_map(x: jax.Array) -> jax.Array:
    """The raw activation in the reference's NCHW convention (B, C, H, W)."""
    if x.ndim == 4:
        return jnp.transpose(x, (0, 3, 1, 2))
    return x


METRIC_FNS = {
    "mean_abs_activation_per_channel": mean_abs_activation_per_channel,
    "mean_activation": mean_activation,
    "std_activation": std_activation,
    "zero_fraction_per_channel": zero_fraction_per_channel,
    "full_activation_map": full_activation_map,
}


def channel_stats(x: jax.Array, metrics: Tuple[str, ...]) -> Dict[str, jax.Array]:
    """Compute the requested metrics for one activation tensor."""
    out: Dict[str, jax.Array] = {}
    for name in metrics:
        fn = METRIC_FNS.get(name)
        if fn is not None:
            out[name] = fn(x)
    return out
