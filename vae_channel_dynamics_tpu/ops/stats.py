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

Batch-validity masking: the trainer pads remainder batches to a static
shape by DUPLICATING the last sample (parallel/mesh.pad_batch_to_multiple).
The reference never pads (torch just runs the smaller batch), so its hook
stats on a remainder batch are means over the real samples only. To match,
the train step installs the batch mask via :func:`tap_mask` around the
model forward; every scalar metric here then reduces over the VALID rows
only — bit-exact reference semantics, with the pad duplicates carrying
zero weight. ``full_activation_map`` is intentionally unmasked (it is the
raw tensor; consumers slice the leading samples, and pad rows sit at the
end). The mask is read at TRACE time (like ``pallas_attention``'s shard
mesh): it must be a tracer of the enclosing trace, which is exactly what
``tap_mask(mask)`` inside the jitted step provides.
"""

from __future__ import annotations

import contextlib
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

_TAP_MASK: Optional[jax.Array] = None


@contextlib.contextmanager
def tap_mask(mask: Optional[jax.Array]):
    """Install a (B,)-shaped 0/1 validity mask for the tap metrics for the
    duration of a trace. Use INSIDE the traced function, around the model
    forward (and its grad trace), with the step's own mask argument — the
    global is consulted while the taps trace, so the mask tracer and the
    activation tracers belong to the same trace."""
    global _TAP_MASK
    prev = _TAP_MASK
    _TAP_MASK = mask
    try:
        yield
    finally:
        _TAP_MASK = prev


def mask_for(x: jax.Array) -> Optional[jax.Array]:
    """The installed validity mask as float32, when it plausibly matches
    ``x``'s leading (batch) dim; None otherwise. Public so batch-leading
    stat producers outside this module (e.g. the fused Pallas resnet
    kernels' per-sample side outputs) can apply the same weighting."""
    m = _TAP_MASK
    if (
        m is None
        or x.ndim < 2
        or getattr(m, "ndim", None) != 1
        or x.shape[0] != m.shape[0]
    ):
        return None
    return m.astype(jnp.float32)


def _masked_channel_mean(v: jax.Array, m: jax.Array) -> jax.Array:
    """Mean of ``v`` over batch+spatial with per-sample weights ``m``."""
    # reduce spatial per sample first (better conditioned than one giant
    # weighted sum, and the weights then broadcast over a (B, C) array)
    per_sample = jnp.mean(v, axis=tuple(range(1, v.ndim - 1)))  # (B, C)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(per_sample * m[:, None], axis=0) / denom


def mean_abs_activation_per_channel(x: jax.Array) -> jax.Array:
    xf = jnp.abs(x.astype(jnp.float32))
    m = mask_for(x)
    if m is None:
        return jnp.mean(xf, axis=tuple(range(x.ndim - 1)))
    return _masked_channel_mean(xf, m)


def mean_activation(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    m = mask_for(x)
    if m is None:
        return jnp.mean(xf)
    per_sample = jnp.mean(xf, axis=tuple(range(1, x.ndim)))  # (B,)
    return jnp.sum(per_sample * m) / jnp.maximum(jnp.sum(m), 1.0)


def std_activation(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    m = mask_for(x)
    if m is None:
        return jnp.std(xf, ddof=1)
    # masked unbiased std over all elements of the valid samples, TWO-pass:
    # the single-pass E[x^2]-E[x]^2 form catastrophically cancels in fp32
    # when |mean| dominates std (the unmasked jnp.std is two-pass too)
    per_elem = math.prod(x.shape[1:])
    w = m.reshape((-1,) + (1,) * (x.ndim - 1))
    n = jnp.sum(m) * float(per_elem)
    mean = jnp.sum(xf * w) / jnp.maximum(n, 1.0)
    centered_sq = jnp.square(xf - mean)
    var = jnp.sum(centered_sq * w) / jnp.maximum(n - 1.0, 1.0)
    return jnp.sqrt(var)


def zero_fraction_per_channel(x: jax.Array, tol: float = 1e-8) -> jax.Array:
    xf = (jnp.abs(x.astype(jnp.float32)) < tol).astype(jnp.float32)
    m = mask_for(x)
    if m is None:
        return jnp.mean(xf, axis=tuple(range(x.ndim - 1)))
    return _masked_channel_mean(xf, m)


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
