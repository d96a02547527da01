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

``parallel.shard_params`` (ZeRO-3) shards the persistent parameter
buffers themselves: XLA all-gathers each weight at its point of use in
the forward/backward pass and keeps the post-update params sharded. On
top of ZeRO-1 the collective volume is nearly unchanged (ZeRO-1 already
all-gathers the fresh params after the sharded update; ZeRO-3 moves that
gather to first use), but the resident fp32 params drop from 335 MB
replicated to 335/N MB per device — with moments and EMA also sharded,
the whole ~1.3 GB fp32 state scales 1/N. Host-side consumers that read
individual param leaves go through ``make_replicate_leaf_fn``.

Axis choice per leaf: the largest dimension divisible by the data-axis
size (conv kernels shard over their channel axes, biases/γ/β over their
only axis); leaves with no divisible dimension — scalars like the Adam
``count`` — stay replicated. The ``slice`` (DCN) and ``spatial`` mesh axes
never shard parameters: optimizer shards must stay within one ICI domain
or the per-step param all-gather would cross DCN. A ``tensor`` axis
(``parallel.tensor`` — tensor/channel parallelism) DOES shard parameters:
params, moments and EMA take their channel axis over it unconditionally,
and the ZeRO flags compose by sharding a remaining axis over ``data``.

Multi-host: sharded leaves are not fully addressable, so main-process
checkpointing cannot ``jax.device_get`` them directly. ``make_gather_fn``
compiles an all-gather (a jitted identity with replicated out-shardings)
that EVERY process runs at save boundaries; the gathered copy IS fully
addressable and the write proceeds on the main process as usual. The
gather costs one state-sized all-gather per checkpoint — amortized over
``save_interval_steps``, not per step.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, TENSOR_AXIS, replicated_sharding


def _best_axis(shape, size: int, taken=()) -> int | None:
    """Largest axis divisible by ``size`` (ties prefer the LAST such axis:
    conv kernels are HWIO, so equal I/O sizes shard the output-channel
    axis, keeping the layout aligned with the parameter's contiguous minor
    dimension); ``taken`` axes are excluded. None if no axis qualifies.

    This is the ZeRO (data-axis) choice: the sharding is pure memory
    relief, so the biggest axis gives the best balance."""
    best = None
    for i, d in enumerate(shape):
        if i in taken:
            continue
        if d >= size and d % size == 0:
            if best is None or d >= shape[best]:
                best = i
    return best


def _channel_axis(shape, size: int) -> int | None:
    """The LAST axis divisible by ``size``; None if no axis qualifies.

    This is the tensor-parallel choice, and unlike ``_best_axis`` it is a
    semantic contract rather than a balance heuristic: conv HWIO kernels
    take O (the contiguous minor dim, so each shard is one block of output
    channels), falling back to I when O doesn't divide (e.g. conv_out's
    O=3); γ/β/bias vectors take their only axis. 'Largest' would instead
    put down-projection convs (I > O, e.g. the decoder's 512→256) on the
    input-channel axis — the opposite layout from the documented one."""
    for i in range(len(shape) - 1, -1, -1):
        d = shape[i]
        if d >= size and d % size == 0:
            return i
    return None


def _leaf_spec(shape, data_size: int) -> P:
    """Shard the largest axis divisible by ``data_size``; replicate if none."""
    best = _best_axis(shape, data_size)
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = DATA_AXIS
    return P(*spec)


def _tensor_size(mesh: Mesh) -> int:
    return int(mesh.shape.get(TENSOR_AXIS, 1))


def _combined_spec(shape, mesh: Mesh, use_data: bool) -> P:
    """Per-leaf spec composing tensor parallelism with ZeRO data sharding.

    When the mesh has a non-trivial ``tensor`` axis, the leaf's channel
    axis shards over it (``_channel_axis``: conv HWIO kernels take O, or I
    when O doesn't divide — e.g. conv_out's O=3; γ/β/bias vectors take
    their only axis). When ``use_data`` (the ZeRO flags), the largest
    REMAINING divisible axis additionally shards over ``data``. Leaves
    with no qualifying axis stay replicated on that mesh axis."""
    tensor = _tensor_size(mesh)
    spec = [None] * len(shape)
    taken = ()
    if tensor > 1:
        i = _channel_axis(shape, tensor)
        if i is not None:
            spec[i] = TENSOR_AXIS
            taken = (i,)
    if use_data:
        j = _best_axis(shape, int(mesh.shape[DATA_AXIS]), taken)
        if j is not None:
            spec[j] = DATA_AXIS
    if all(s is None for s in spec):
        return P()
    return P(*spec)


def opt_state_shardings(mesh: Mesh, opt_state: Any) -> Any:
    """Per-leaf NamedShardings for an optimizer-state pytree (data-axis
    ZeRO sharding, composed with the tensor axis when the mesh has one)."""

    def leaf(x):
        return NamedSharding(mesh, _combined_spec(x.shape, mesh, True))

    return jax.tree.map(leaf, opt_state)


def tensor_shardings(mesh: Mesh, tree: Any) -> Any:
    """Per-leaf NamedShardings for tensor (channel) parallelism only: the
    best channel axis of each leaf shards over the mesh's ``tensor`` axis,
    nothing shards over ``data`` (params under TP without ZeRO-3)."""

    def leaf(x):
        return NamedSharding(mesh, _combined_spec(x.shape, mesh, False))

    return jax.tree.map(leaf, tree)


def state_shardings(
    mesh: Mesh,
    state: Any,
    shard_optimizer: bool,
    shard_ema: bool = False,
    shard_params: bool = False,
) -> Any:
    """A sharding pytree matching ``state`` (a TrainState): everything
    replicated, except the optimizer state when ``shard_optimizer``, the
    EMA parameter copy when ``shard_ema``, and the params themselves when
    ``shard_params`` (ZeRO-3) — usable both for ``jax.device_put``
    placement and as the train step's in/out shardings.

    ``shard_ema`` extends the same idea to ``state.ema_params`` (another
    full fp32 copy of the parameters, ~335 MB for the SDXL VAE): the EMA
    blend is purely elementwise (``e*d + p*(1-d)``), so with EMA sharded
    and params replicated XLA just reads each device's local slice of the
    params — zero extra collectives in the step; the all-gather happens
    once, at checkpoint/export time via ``jax.device_get``.

    Tensor parallelism composes automatically: when the mesh carries a
    non-trivial ``tensor`` axis (``parallel.tensor`` > 1), params, moments
    AND the EMA copy always shard their channel axis over it — the moments
    live elementwise with the params, so a TP layout where they disagreed
    would force XLA to gather grads and keep full moments everywhere. The
    ZeRO flags then shard a REMAINING axis over ``data`` on top
    (``_combined_spec``)."""
    repl = replicated_sharding(mesh)
    tensor = _tensor_size(mesh) > 1

    def leaf_shardings(tree, use_data):
        if use_data:
            return opt_state_shardings(mesh, tree)
        return tensor_shardings(mesh, tree)

    shardings = jax.tree.map(lambda _: repl, state)
    if shard_optimizer or tensor:
        shardings = shardings.replace(
            opt_state=leaf_shardings(state.opt_state, shard_optimizer)
        )
    if (shard_ema or tensor) and state.ema_params is not None:
        shardings = shardings.replace(
            ema_params=leaf_shardings(state.ema_params, shard_ema)
        )
    if shard_params or tensor:
        shardings = shardings.replace(
            params=leaf_shardings(state.params, shard_params)
        )
    return shardings


def make_replicate_leaf_fn(mesh: Mesh):
    """A leaf-level re-replicator for host fetches of sharded params.

    Under ``parallel.shard_params`` the persistent parameter buffers are
    sharded; host-side consumers that fetch individual leaves (the nudger
    reads GroupNorm γ vectors, the dead tracker snapshots configured raw
    weights) can ``np.asarray`` a sharded leaf only while it is fully
    addressable (single process). On multi-host meshes the returned
    function routes such leaves through a jitted identity with a
    replicated out-sharding — an all-gather, so it MUST be reached by all
    processes in the same order (both call sites run un-gated on every
    process). Fully-addressable leaves pass through untouched."""
    repl = replicated_sharding(mesh)
    gather = jax.jit(lambda x: x, out_shardings=repl)

    def replicate(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return gather(x)
        return x

    return replicate


def make_gather_fn(mesh: Mesh, state: Any):
    """A jitted identity that re-replicates every leaf of ``state``.

    Checkpointing fetches the state with ``jax.device_get``, which needs
    fully-addressable arrays; on multi-host meshes the ZeRO shards are
    not. Every process calls the returned function at a save boundary
    (it compiles to an all-gather — an SPMD collective, so ALL processes
    must participate), and the result is a fully-replicated, fully-
    addressable snapshot safe to fetch and write from the main process.
    The input state is NOT donated — the live (sharded) state stays valid
    for the next train step."""
    repl = replicated_sharding(mesh)
    out_shardings = jax.tree.map(lambda _: repl, state)
    return jax.jit(lambda s: s, out_shardings=out_shardings)
