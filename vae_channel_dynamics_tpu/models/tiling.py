"""Tiled and sliced VAE inference — the TPU-native analog of diffusers'
``AutoencoderKL.enable_tiling()`` / ``enable_slicing()``.

The reference wraps a diffusers ``AutoencoderKL`` (src/models/sdxl_vae_wrapper.py:31-34),
whose public API includes tiled encode/decode for images larger than HBM can
hold in one pass: the image is cut into overlapping tiles, each tile runs
through the encoder/decoder alone, and neighboring tiles are linearly blended
over the overlap so seams vanish. Activations scale with the TILE size, not
the image size — a 16 GB chip that OOMs on a 2048px decode runs it tiled.

TPU-first design (vs the torch original's Python loop of varying-shape
slices):

- **One compiled tile program.** All tiles have one static shape; the grid is
  swept with ``lax.map`` (a scan), so XLA compiles the encoder/decoder body
  once and reuses the same activation buffers for every tile. The torch
  version re-runs eager kernels per tile and lets edge tiles be smaller;
  data-dependent shapes like that would force one XLA program per distinct
  edge size.
- **Clamped final tiles instead of truncated ones.** Where the grid overruns
  the image, the last tile start is clamped to ``size - tile`` (it overlaps
  its neighbor more), so every tile sees real pixels at full tile shape.
  This is the one deliberate deviation from diffusers semantics: their final
  tile is a smaller crop, ours is a full-size shifted window. Interior output
  is the faithful blend; the border region sees strictly MORE context.
- **Blending matches diffusers exactly** (autoencoder_kl tiled_encode/
  tiled_decode): per-axis linear ramp ``y / blend_extent``, vertical blend
  first then horizontal, each reading the UN-blended neighbor tile, then each
  tile contributes a ``stride``-sized output cell. Generalized with a
  per-neighbor row offset so the clamped last tile blends at its cell
  boundary.

Tiling is an inference-path feature (encode/decode with scaling factor);
training always runs untiled. GroupNorm statistics are per-tile by
construction — same approximation the torch implementation makes.
"""

from __future__ import annotations

import math
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def tile_starts(size: int, tile: int, stride: int) -> List[int]:
    """Static tile start offsets covering ``[0, size)``.

    Matches diffusers' ``range(0, size, stride)`` grid except that any start
    whose tile would overrun the image is clamped to ``size - tile`` (all
    tiles keep one static shape). Consecutive clamped starts collapse to one.
    """
    if tile <= 0 or stride <= 0:
        raise ValueError(f"tile ({tile}) and stride ({stride}) must be positive")
    if stride > tile:
        raise ValueError(f"stride ({stride}) must not exceed tile ({tile})")
    if size <= tile:
        return [0]
    n = math.ceil((size - tile) / stride) + 1
    return [min(k * stride, size - tile) for k in range(n)]


def _cell_bounds(starts: Sequence[int], size: int, stride: int) -> List[Tuple[int, int]]:
    """Output cell ``[begin, end)`` per tile: tile k owns ``[k*stride, (k+1)*stride)``
    (the last extends to ``size``), exactly diffusers' ``row_limit`` crop-and-cat."""
    cells = []
    for k in range(len(starts)):
        begin = k * stride
        end = min((k + 1) * stride, size) if k < len(starts) - 1 else size
        cells.append((begin, end))
    return cells


def _blend_edge(
    prev: Array, cur: Array, axis: int, blend: int, cur_lo: int, prev_lo: int
) -> Array:
    """Linearly blend ``cur`` rows ``[cur_lo, cur_lo+blend)`` (along ``axis``)
    against ``prev`` rows ``[prev_lo, prev_lo+blend)``: weight ramps from all-
    prev at the first row to (almost) all-cur, diffusers' ``y / blend_extent``."""
    if blend <= 0:
        return cur
    cur_rows = lax.slice_in_dim(cur, cur_lo, cur_lo + blend, axis=axis)
    prev_rows = lax.slice_in_dim(prev, prev_lo, prev_lo + blend, axis=axis)
    shape = [1] * cur.ndim
    shape[axis] = blend
    t = (jnp.arange(blend, dtype=jnp.float32) / blend).reshape(shape)
    # prev + (cur - prev)*t == diffusers' prev*(1-t) + cur*t, but exact when
    # the two tiles agree (identity-reassembly invariant, pinned in tests).
    prev32 = prev_rows.astype(jnp.float32)
    mixed = (prev32 + (cur_rows.astype(jnp.float32) - prev32) * t).astype(cur.dtype)
    pieces = []
    if cur_lo > 0:
        pieces.append(lax.slice_in_dim(cur, 0, cur_lo, axis=axis))
    pieces.append(mixed)
    if cur_lo + blend < cur.shape[axis]:
        pieces.append(lax.slice_in_dim(cur, cur_lo + blend, cur.shape[axis], axis=axis))
    return jnp.concatenate(pieces, axis=axis)


def tiled_apply(
    fn: Callable[[Array], Array],
    x: Array,
    tile_in: int,
    stride_in: int,
    scale_num: int,
    scale_den: int,
) -> Array:
    """Run ``fn`` (a spatial map: NHWC tile -> NHWC tile whose spatial dims are
    ``in * scale_num / scale_den``) over an overlapping tile grid of ``x`` and
    blend the results. ``fn`` is traced ONCE (``lax.map`` over tile offsets);
    all tile shapes are static.

    encode: scale 1/downsample_factor; decode: scale upsample_factor/1.
    Every dimension entering the output space (tile, stride, image size) must
    be divisible by ``scale_den``.
    """
    n, h, w, _ = x.shape
    if tile_in % scale_den or stride_in % scale_den or h % scale_den or w % scale_den:
        raise ValueError(
            f"tile ({tile_in}), stride ({stride_in}) and image ({h}x{w}) must be "
            f"divisible by the model's spatial factor {scale_den}"
        )
    # Per-axis tile size: an axis no larger than the tile stays whole (one
    # "tile" spanning it), so a tall-and-narrow image tiles only along H.
    tile_h, tile_w = min(tile_in, h), min(tile_in, w)
    sh = tile_starts(h, tile_h, min(stride_in, tile_h))
    sw = tile_starts(w, tile_w, min(stride_in, tile_w))
    if len(sh) == 1 and len(sw) == 1:
        return fn(x)

    def out(v: int) -> int:
        return v * scale_num // scale_den

    stride_out = out(stride_in)
    blend_h = out(tile_h) - stride_out if len(sh) > 1 else 0
    blend_w = out(tile_w) - stride_out if len(sw) > 1 else 0
    starts = jnp.asarray([(i, j) for i in sh for j in sw], dtype=jnp.int32)

    def run_tile(ij):
        tile = lax.dynamic_slice(
            x, (0, ij[0], ij[1], 0), (n, tile_h, tile_w, x.shape[3])
        )
        return fn(tile)

    # (n_tiles, N, tile_out, tile_out, C_out); the scan reuses one tile
    # program's buffers, so live activation memory is O(tile), not O(image).
    tiles = lax.map(run_tile, starts)

    nh, nw = len(sh), len(sw)
    grid = [[tiles[i * nw + j] for j in range(nw)] for i in range(nh)]
    cells_h = _cell_bounds(sh, out(h), stride_out)
    cells_w = _cell_bounds(sw, out(w), stride_out)
    sh_out = [out(s) for s in sh]
    sw_out = [out(s) for s in sw]

    rows = []
    for i in range(nh):
        row = []
        for j in range(nw):
            t = grid[i][j]
            # Vertical then horizontal, each against the UN-blended neighbor
            # (diffusers blend_v/blend_h read the original tiles). The blend
            # sits at the cell boundary: local row of global row g in tile k
            # is g - start_out[k] (0 for un-clamped tiles, diffusers' case).
            if i > 0:
                t = _blend_edge(
                    grid[i - 1][j], t, axis=1, blend=blend_h,
                    cur_lo=cells_h[i][0] - sh_out[i],
                    prev_lo=cells_h[i][0] - sh_out[i - 1],
                )
            if j > 0:
                t = _blend_edge(
                    grid[i][j - 1], t, axis=2, blend=blend_w,
                    cur_lo=cells_w[j][0] - sw_out[j],
                    prev_lo=cells_w[j][0] - sw_out[j - 1],
                )
            lo_h, hi_h = cells_h[i][0] - sh_out[i], cells_h[i][1] - sh_out[i]
            lo_w, hi_w = cells_w[j][0] - sw_out[j], cells_w[j][1] - sw_out[j]
            row.append(t[:, lo_h:hi_h, lo_w:hi_w, :])
        rows.append(jnp.concatenate(row, axis=2))
    return jnp.concatenate(rows, axis=1)


def sliced_apply(fn: Callable[[Array], Array], x: Array) -> Array:
    """Run ``fn`` one batch element at a time (diffusers ``enable_slicing``):
    activation memory for batched inference drops to the single-sample cost.
    ``lax.map`` over the batch keeps a single compiled body."""
    if x.shape[0] <= 1:
        return fn(x)
    y = lax.map(lambda s: fn(s[None]), x)  # (B, 1, ...)
    return y.reshape((y.shape[0],) + y.shape[2:])
