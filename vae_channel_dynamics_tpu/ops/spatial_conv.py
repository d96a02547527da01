"""Manual halo-exchange convolution over a spatially-sharded mesh.

``parallel.spatial`` shards image rows (H) over the mesh's ``spatial``
axis so activations larger than one chip's HBM can be trained at all
(SCALING.md). The default implementation leaves the halo exchange to XLA
GSPMD — but jax 0.9.0 GSPMD miscompiles halo-exchange convolutions three
distinct ways (forward with feature-sharded kernels; kernel gradients
under unused mesh axes; parameter gradients of the full model with
ZeRO-3-sharded leaves — all pinned as strict-xfail canaries in
tests/test_spatial_tensor_guard.py), which forced two framework guards:
``make_mesh`` refuses ``spatial x tensor``, and the train/eval steps
re-replicate sharded params at compute time on spatial meshes.

This module is the escape hatch that makes those guards unnecessary:
``parallel.spatial_conv: shard_map`` routes every convolution's spatial
axis around GSPMD entirely. Each conv becomes a ``jax.shard_map`` region
that is MANUAL over ``spatial`` only (``axis_names={"spatial"}`` — the
data/tensor/slice axes stay automatic): the halo rows are exchanged
explicitly with ``lax.ppermute`` (edge shards receive zeros, which is
exactly the conv's zero padding) and the body runs a plain LOCAL
convolution, which GSPMD partitions over the remaining axes through the
known-good non-spatial code paths. ``ppermute`` differentiates exactly
(its transpose is the reverse permutation), so forward AND backward are
correct by construction — asserted exact at float64 against the global
conv for all three miscompile scenarios in tests/test_spatial_conv.py.

This is the scaling-book recipe applied at op granularity: pick the one
axis the compiler gets wrong, write its collectives by hand, and let XLA
keep everything it gets right (batch/feature partitioning, fusion inside
the body). The reference has no model-spatial axis at all (SURVEY.md
§2b: DDP only); this path exists for high-resolution scale-out where
activations exceed one chip.

Halo arithmetic (H sharded S ways, local rows h = H/S, kernel kh,
stride s, asymmetric zero padding (pt, pb)): shard i computes output
rows [i*ho, (i+1)*ho) and needs input rows [i*h - L, (i+1)*h - 1 + R]
with  L = pt  and  R = kh - s - pt  (independent of i — that uniformity
is what makes one SPMD program suffice). The model's conv geometries:

  3x3 stride 1 pad (1,1)      -> L=1, R=1   (resnet/in/out convs)
  3x3 stride 2 pad (0,1)      -> L=0, R=1   (Downsample2D, diffusers pad)
  1x1 stride 1 pad (0,0)      -> L=0, R=0   (shortcuts, latent projs)
  4x4 lhs_dilation 2 pad (2,2)-> L=1, R=1   (Upsample2D's fused
                                  nearest-up conv: one INPUT row each way
                                  covers two dilated positions, and the
                                  local lhs-dilated VALID conv reproduces
                                  the global padded program exactly)
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

SPATIAL_AXIS = "spatial"  # keep in sync with parallel.mesh.SPATIAL_AXIS

_ACTIVE_MESH: Optional[Mesh] = None


@contextlib.contextmanager
def spatial_conv_scope(mesh: Optional[Mesh]):
    """Install ``mesh`` as the active spatial-conv mesh for the duration
    of a trace. Use INSIDE the traced step function, around the model
    forward (and its grad trace) — the same trace-time-context pattern as
    ``ops.stats.tap_mask``. A mesh without a >1 ``spatial`` axis (or
    ``None``) installs nothing, so callers can wrap unconditionally."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    if (
        mesh is not None
        and SPATIAL_AXIS in mesh.axis_names
        and int(mesh.shape[SPATIAL_AXIS]) > 1
    ):
        _ACTIVE_MESH = mesh
    try:
        yield
    finally:
        _ACTIVE_MESH = prev


def active_spatial_mesh() -> Optional[Mesh]:
    """The mesh installed by :func:`spatial_conv_scope`, or None."""
    return _ACTIVE_MESH


def _halo_widths(
    kh: int, stride: int, pad: Tuple[int, int], h: int, H: int, S: int
) -> Tuple[int, int]:
    """Left/right halo row counts for the undilated case, with the
    divisibility checks that make one uniform SPMD program valid."""
    pt, pb = pad
    L, R = pt, kh - stride - pt
    if R < 0:
        raise ValueError(
            f"spatial_conv: unsupported conv geometry kh={kh} stride={stride} "
            f"pad={pad} (negative right halo {R})"
        )
    if L > h or R > h:
        raise ValueError(
            f"spatial_conv: halo ({L},{R}) exceeds the {h} local rows "
            f"(H={H} over spatial={S}) — lower parallel.spatial or raise "
            "the resolution"
        )
    if (h + L + R - kh) % stride != 0:
        raise ValueError(
            f"spatial_conv: local rows {h} not stride-aligned for "
            f"kh={kh} stride={stride} pad={pad}"
        )
    ho = (h + L + R - kh) // stride + 1
    H_out = (H + pt + pb - kh) // stride + 1
    if ho * S != H_out:
        raise ValueError(
            f"spatial_conv: global output rows {H_out} do not shard evenly "
            f"({S} shards x {ho} local rows) for H={H} kh={kh} "
            f"stride={stride} pad={pad} — choose parallel.spatial so every "
            "resolution level divides evenly"
        )
    return L, R


def _exchange(xb: jax.Array, L: int, R: int, S: int) -> jax.Array:
    """Concatenate L rows from the previous shard and R rows from the next
    onto the local block. Edge shards have no partner in the permutation
    and receive zeros — precisely the global conv's zero padding."""
    parts = []
    if L:
        parts.append(
            lax.ppermute(
                xb[:, -L:], SPATIAL_AXIS, [(i, i + 1) for i in range(S - 1)]
            )
        )
    parts.append(xb)
    if R:
        parts.append(
            lax.ppermute(
                xb[:, :R], SPATIAL_AXIS, [(i, i - 1) for i in range(1, S)]
            )
        )
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else xb


def halo_conv(
    x: jax.Array,
    kernel: jax.Array,
    *,
    strides: Tuple[int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    mesh: Mesh,
    precision=None,
    lhs_dilation: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """NHWC/HWIO convolution with the H axis sharded over ``mesh``'s
    ``spatial`` axis, halos exchanged manually under ``shard_map``.

    Exact (same math, same dtype rules) as
    ``lax.conv_general_dilated(x, kernel, strides, padding, ...)`` on the
    global array; W stays unsharded and keeps the caller's padding.
    ``lhs_dilation=(2,2)`` supports Upsample2D's fused nearest-up conv
    (kh=4, pad 2) — the only dilated geometry the model uses."""
    S = int(mesh.shape[SPATIAL_AXIS])
    H = x.shape[1]
    if H % S != 0:
        raise ValueError(
            f"spatial_conv: H={H} not divisible by the {S}-way spatial axis"
        )
    h = H // S
    kh = kernel.shape[0]
    (hpad, wpad) = padding
    if lhs_dilation is not None and lhs_dilation != (1, 1):
        if lhs_dilation != (2, 2) or kh != 4 or hpad != (2, 2) or strides != (1, 1):
            raise ValueError(
                "spatial_conv: the only supported dilated geometry is the "
                "fused nearest-up conv (kernel 4, lhs_dilation 2, pad 2, "
                f"stride 1); got kh={kh} dil={lhs_dilation} pad={hpad} "
                f"strides={strides}"
            )
        # One input row each way covers dilated positions 2r (value) and
        # 2r±1 (dilation zero); the local lhs-dilated VALID conv over
        # (h+2) rows yields 2(h+2)-1-4+1 = 2h rows = the local share of
        # the 2H global output. Edge shards' zero halos reproduce the
        # global pad-2 columns (value-zero + dilation-zero).
        L = R = 1
        local_hpad = (0, 0)
        dil = (2, 2)
    else:
        L, R = _halo_widths(kh, strides[0], hpad, h, H, S)
        local_hpad = (0, 0)
        dil = (1, 1)

    # Manual over the batch axes TOO, not just spatial: XLA (jax 0.9.0)
    # CRASHES ("Invalid binary instruction opcode copy",
    # hlo_instruction.cc) partitioning the BACKWARD of a low-precision
    # (bf16) conv inside a shard_map region whenever any mesh axis remains
    # automatic — fully-manual compiles and matches the oracle. Making
    # slice/data manual costs nothing (the batch block is embarrassingly
    # parallel inside the conv; grad psums over batch axes are inserted by
    # the shard_map transpose exactly where GSPMD would put them). The
    # `tensor` axis must stay automatic (its per-kernel channel specs vary
    # by leaf), so bf16 + tensor + shard_map is refused loudly below —
    # pinned by the subprocess canary in tests/test_spatial_conv.py.
    manual = {SPATIAL_AXIS}
    batch_axes = []
    for ax in ("slice", "data"):
        if ax in mesh.axis_names:
            manual.add(ax)
            batch_axes.append(ax)
    has_auto_tensor = (
        "tensor" in mesh.axis_names and int(mesh.shape["tensor"]) > 1
    )
    if has_auto_tensor and jnp.dtype(x.dtype).itemsize < 4:
        raise ValueError(
            "spatial_conv=shard_map with parallel.tensor and "
            f"{x.dtype} compute: jax 0.9.0 XLA crashes compiling the "
            "backward of a low-precision conv inside a shard_map region "
            "that leaves a mesh axis automatic (the tensor axis must stay "
            "automatic — its channel sharding varies per kernel). Use "
            "fp32 compute (mixed_precision: 'no') on spatial x tensor "
            "meshes, or drop one of the axes; see "
            "tests/test_spatial_conv.py's crash canary."
        )
    bspec = tuple(batch_axes) if batch_axes else None

    def body(xb, k):
        xp = _exchange(xb, L, R, S)
        return lax.conv_general_dilated(
            xp,
            k,
            window_strides=strides,
            padding=(local_hpad, wpad),
            lhs_dilation=dil,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        axis_names=manual,
        in_specs=(P(bspec, SPATIAL_AXIS), P()),
        out_specs=P(bspec, SPATIAL_AXIS),
    )(x, kernel)
