"""Train state pytree: parameters, optimizer state, step counter, and the
on-device activation-statistics accumulator.

The stats accumulator is the device-resident replacement for the
reference's host-side ``hook_collected_buffer`` (src/tracking/monitor.py:30):
per-channel statistic sums live in the state and are only fetched to host at
the monitor's track interval, so the hot loop never synchronizes."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    # {stat_key: running sum of per-forward values} + forward count
    stats_acc: Dict[str, jax.Array] = struct.field(default_factory=dict)
    stats_count: jax.Array = struct.field(default_factory=lambda: jnp.zeros((), jnp.float32))
    # exponential moving average of params (training.ema_decay > 0);
    # None when disabled so checkpoints keep their pre-EMA layout
    ema_params: Any = None

    @classmethod
    def create(cls, params, tx, stats_acc=None, ema: bool = False) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            stats_acc=stats_acc or {},
            stats_count=jnp.zeros((), jnp.float32),
            ema_params=jax.tree.map(jnp.array, params) if ema else None,
        )

    def reset_stats(self) -> "TrainState":
        return self.replace(
            stats_acc=jax.tree.map(jnp.zeros_like, self.stats_acc),
            stats_count=jnp.zeros((), jnp.float32),
        )
