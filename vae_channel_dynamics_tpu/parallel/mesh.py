"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's HF Accelerate DDP layer (SURVEY.md §2b).

Where the reference spawns one process per GPU and relies on NCCL all-reduce
inside ``accelerator.backward`` (src/train.py:120-122, :299), here a single
SPMD program is jit-compiled over a ``jax.sharding.Mesh``: the batch is
sharded over the ``data`` axis, parameters/optimizer state are replicated,
and XLA inserts the gradient/metric all-reduces over ICI automatically from
the sharding constraints. Multi-host execution uses
``jax.distributed.initialize`` (one process per host, same program).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
SLICE_AXIS = "slice"
TENSOR_AXIS = "tensor"


def initialize_distributed() -> None:
    """Initialize multi-host JAX when launched under a cluster environment
    (the ``accelerate launch`` analog). Safe no-op for single-process runs."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
        logger.info(
            "jax.distributed initialized: process %d/%d, %d local / %d global devices",
            jax.process_index(),
            jax.process_count(),
            jax.local_device_count(),
            jax.device_count(),
        )


def _order_devices_for_slices(devices, slices: int):
    """Order ``devices`` so reshape(slices, -1) puts each physical slice in
    its own mesh row (the ``slice`` axis must match the DCN boundary —
    that alignment is the entire point of the hierarchical layout).

    Real multi-slice runtimes tag devices with ``slice_index``; group by it
    and REFUSE any layout where the tags can't be partitioned evenly: a
    silent misgrouping would route ICI-sized gradient traffic over DCN,
    which is a performance cliff, not an error the user would ever see.
    Untagged devices (virtual meshes, single slice) keep their given order
    and are grouped contiguously."""
    idx = {getattr(d, "slice_index", None) for d in devices}
    if len(idx) <= 1:
        return devices  # untagged or single physical slice: contiguous rows
    if None in idx:
        raise ValueError(
            "parallel.slices>1 but only some devices report a slice_index; "
            "cannot align the slice axis with the DCN boundary"
        )
    if len(idx) != slices:
        raise ValueError(
            f"parallel.slices={slices} but the runtime reports "
            f"{len(idx)} distinct device slice_index values"
        )
    counts: Dict[Any, int] = {}
    for d in devices:
        counts[d.slice_index] = counts.get(d.slice_index, 0) + 1
    if len(set(counts.values())) != 1:
        raise ValueError(
            "uneven devices per slice_index (reshape would mix physical "
            f"slices within a mesh row): {counts}"
        )
    return sorted(devices, key=lambda d: (d.slice_index, d.id))


def make_mesh(
    n_devices: Optional[int] = None,
    spatial: int = 1,
    slices: int = 1,
    tensor: int = 1,
    spatial_conv: str = "gspmd",
) -> Mesh:
    """Device mesh over the first ``n_devices`` devices.

    ``spatial=1`` gives the 1-D data-parallel mesh. ``spatial>1`` builds a
    2-D (data, spatial) mesh: the batch axis shards over ``data`` and image
    rows (H) shard over ``spatial`` — GSPMD inserts the conv halo exchanges
    — which is the scale-out path for high-resolution (1024px) training
    where activations exceed one chip's HBM.

    ``slices>1`` adds a leading ``slice`` axis for multi-slice pods (several
    ICI-connected slices joined by DCN): devices are grouped by their
    ``slice_index`` when the runtime exposes one (real multi-slice TPU), or
    contiguously otherwise (virtual meshes, single slice). The batch shards
    over ``(slice, data)`` jointly (see ``batch_sharding``), so the slice
    axis is OUTERMOST in the mesh layout and XLA's gradient all-reduce
    decomposes hierarchically: reduce-scatter/all-gather over ICI within
    each slice, and only the per-slice partial crosses DCN once — the
    scaling-book recipe for collectives that ride ICI, not DCN.

    ``tensor>1`` adds an INNERMOST ``tensor`` axis for tensor (channel)
    parallelism: parameters shard their channel dimensions over it (see
    parallel/zero.py ``state_shardings``) and GSPMD derives the activation
    gathers/partial-sum reductions at each conv. Innermost = the shards are
    ICI nearest-neighbours, where the per-layer collectives are cheapest.
    The reference has no model-parallel axis at all (SURVEY.md §2b: DP
    only); this axis exists for HBM relief beyond what ZeRO-3 + spatial
    sharding give — see SCALING.md for when each axis pays."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"Requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    for name, k in (("slices", slices), ("spatial", spatial), ("tensor", tensor)):
        if k < 1:
            raise ValueError(f"parallel.{name} must be >= 1, got {k}")
    if spatial_conv not in ("gspmd", "shard_map"):
        raise ValueError(
            f"parallel.spatial_conv must be 'gspmd' or 'shard_map', "
            f"got {spatial_conv!r}"
        )
    if spatial > 1 and tensor > 1 and spatial_conv != "shard_map":
        # GSPMD miscompiles (jax 0.9.0) on spatial x tensor meshes, two
        # ways: (a) a halo-exchange conv whose KERNEL is O-sharded on the
        # tensor axis returns output scaled by the tensor-axis size; (b)
        # even with every operand replicated, the kernel-GRADIENT of a
        # halo conv is scaled by the size of any mesh axis the program
        # leaves unused — so a "gathered-weights" workaround is wrong in
        # the backward too. Minimal repros + strict-xfail canaries (lift
        # this guard when they xpass): tests/test_spatial_tensor_guard.py.
        # The combination is also strictly dominated: under a spatial
        # mesh, widening `data` and setting parallel.shard_params gives
        # the same 1/N weight-memory relief via the (round-5-fixed)
        # replicated-compute ZeRO-3 path with no exposure to either bug.
        raise ValueError(
            "parallel.spatial and parallel.tensor cannot be combined under "
            "the default GSPMD spatial partitioner: XLA GSPMD miscompiles "
            "halo-exchange convs on such meshes (forward with "
            "feature-sharded kernels AND kernel gradients under unused "
            "mesh axes). Either set parallel.spatial_conv: shard_map "
            "(manual halo exchange, exact on these meshes — "
            "ops/spatial_conv.py) or use a wider data axis with "
            "parallel.shard_params — same per-device weight memory, "
            "correct math; see tests/test_spatial_tensor_guard.py and "
            "SCALING.md."
        )
    if len(devices) % (spatial * slices * tensor) != 0:
        raise ValueError(
            f"{len(devices)} devices not divisible by "
            f"slices={slices} x spatial={spatial} x tensor={tensor}"
        )
    if slices > 1:
        devices = _order_devices_for_slices(devices, slices)
    # axis order (outer → inner): slice (DCN), data, spatial, tensor (ICI
    # nearest-neighbour); trivial axes are dropped so existing 1-D/2-D/3-D
    # mesh layouts (and their jit caches / tests) are byte-identical
    data = len(devices) // (slices * spatial * tensor)
    shape = [slices, data, spatial, tensor]
    names = [SLICE_AXIS, DATA_AXIS, SPATIAL_AXIS, TENSOR_AXIS]
    keep = [
        i
        for i, (nm, sz) in enumerate(zip(names, shape))
        if nm == DATA_AXIS or sz > 1
    ]
    grid = np.asarray(devices).reshape([shape[i] for i in keep])
    return Mesh(grid, tuple(names[i] for i in keep))


def _batch_axes(mesh: Mesh):
    """The mesh axes the batch dimension shards over: ``(slice, data)``
    jointly on multi-slice meshes, ``data`` alone otherwise."""
    if SLICE_AXIS in mesh.axis_names:
        return (SLICE_AXIS, DATA_AXIS)
    return DATA_AXIS


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Image-batch sharding: batch over ``data`` (and ``slice`` when
    present), plus H over ``spatial`` when the mesh has a spatial axis
    (NHWC dim 1)."""
    axes = _batch_axes(mesh)
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(axes, SPATIAL_AXIS))
    return NamedSharding(mesh, P(axes))


def vector_sharding(mesh: Mesh) -> NamedSharding:
    """1-D per-sample vectors (masks, per-sample losses): batch over data."""
    return NamedSharding(mesh, P(_batch_axes(mesh)))


def data_axis_size(mesh: Mesh) -> int:
    """Number of batch shards (slice x data on multi-slice meshes)."""
    n = int(mesh.shape[DATA_AXIS])
    if SLICE_AXIS in mesh.axis_names:
        n *= int(mesh.shape[SLICE_AXIS])
    return n


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_global_array(local: np.ndarray, sharding: NamedSharding):
    """Assemble a globally-sharded array from this process's slice.

    Single-process: a plain device_put. Multi-host: each process passes the
    rows of the global batch that live on its addressable devices and
    ``jax.make_array_from_process_local_data`` stitches the global logical
    array (the per-process dataloader sharding HF Accelerate does inside
    ``prepare``, done the SPMD way)."""
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def pad_batch_to_multiple(
    batch: Dict[str, np.ndarray], multiple: int
) -> tuple[Dict[str, np.ndarray], np.ndarray]:
    """Pad the batch's leading axis up to a multiple of the mesh size by
    repeating the last element; returns (padded_batch, validity mask). Keeps
    remainder batches usable under SPMD's static-shape requirement without
    skewing metrics: the mask weights the loss/metric averages AND the
    activation-stat taps (ops/stats.tap_mask, installed by the train step;
    the fused Pallas resnet kernels weight their per-sample side outputs the
    same way), so the duplicated pad rows carry zero statistical weight."""
    n = next(iter(batch.values())).shape[0]
    padded_n = ((n + multiple - 1) // multiple) * multiple
    mask = np.zeros(padded_n, np.float32)
    mask[:n] = 1.0
    if padded_n == n:
        return batch, mask
    out = {}
    for k, v in batch.items():
        pad = np.repeat(v[-1:], padded_n - n, axis=0)
        out[k] = np.concatenate([v, pad], axis=0)
    return out, mask
