"""ZeRO-1 optimizer-state sharding (``parallel.shard_optimizer``).

The reference replicates the full AdamW state on every GPU (torch AdamW
under Accelerate DDP, src/train.py:184-211) — for the SDXL VAE that is
~670 MB of fp32 moments per device on top of the 335 MB fp32 params. Here
the optimizer-state pytree can instead be sharded over the mesh's ``data``
axis: each device owns 1/N of every moment tensor, XLA turns the gradient
all-reduce into reduce-scatter + sharded update + param all-gather (the
ZeRO-1 schedule) purely from sharding annotations — no hand-written
collectives, and the extra gather rides ICI.

``parallel.shard_ema`` applies the same per-leaf sharding to the EMA
parameter copy (``training.ema_decay``): the EMA update is elementwise,
so a sharded EMA adds no in-step collectives at all — each device blends
its slice of the (replicated) params into its EMA shard.

Axis choice per leaf: the largest dimension divisible by the data-axis
size (conv kernels shard over their channel axes, biases/γ/β over their
only axis); leaves with no divisible dimension — scalars like the Adam
``count`` — stay replicated. The ``slice`` (DCN) and ``spatial`` mesh axes
never shard parameters: optimizer shards must stay within one ICI domain
or the per-step param all-gather would cross DCN.

Scope: single-process meshes (one host driving all chips — every real
single-slice TPU VM). Multi-host runs keep the state replicated because
main-process-only checkpointing fetches the full state with
``jax.device_get``, which requires fully-addressable arrays; the trainer
warns and falls back (see training/loop.py).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, replicated_sharding


def _leaf_spec(shape, data_size: int) -> P:
    """Shard the largest axis divisible by ``data_size``; replicate if none.

    Ties prefer the LAST such axis: conv kernels are HWIO, so equal I/O
    sizes shard the output-channel axis, keeping the moment layout aligned
    with the all-gathered parameter's contiguous minor dimension.
    """
    best = None
    for i, d in enumerate(shape):
        if d >= data_size and d % data_size == 0:
            if best is None or d >= shape[best]:
                best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = DATA_AXIS
    return P(*spec)


def opt_state_shardings(mesh: Mesh, opt_state: Any) -> Any:
    """Per-leaf NamedShardings for an optimizer-state pytree."""
    data_size = int(mesh.shape[DATA_AXIS])

    def leaf(x):
        return NamedSharding(mesh, _leaf_spec(x.shape, data_size))

    return jax.tree.map(leaf, opt_state)


def state_shardings(
    mesh: Mesh, state: Any, shard_optimizer: bool, shard_ema: bool = False
) -> Any:
    """A sharding pytree matching ``state`` (a TrainState): everything
    replicated, except the optimizer state when ``shard_optimizer`` and the
    EMA parameter copy when ``shard_ema`` — usable both for
    ``jax.device_put`` placement and as the train step's in/out shardings.

    ``shard_ema`` extends the same idea to ``state.ema_params`` (another
    full fp32 copy of the parameters, ~335 MB for the SDXL VAE): the EMA
    blend is purely elementwise (``e*d + p*(1-d)``), so with EMA sharded
    and params replicated XLA just reads each device's local slice of the
    params — zero extra collectives in the step; the all-gather happens
    once, at checkpoint/export time via ``jax.device_get``."""
    repl = replicated_sharding(mesh)
    shardings = jax.tree.map(lambda _: repl, state)
    if shard_optimizer:
        shardings = shardings.replace(
            opt_state=opt_state_shardings(mesh, state.opt_state)
        )
    if shard_ema and state.ema_params is not None:
        shardings = shardings.replace(
            ema_params=opt_state_shardings(mesh, state.ema_params)
        )
    return shardings
