"""Fused GroupNorm+SiLU+conv3x3 Pallas TPU kernels — the resnet hot path.

The SDXL-VAE resnet block is ``conv(silu(gn(x)))`` twice plus a residual
(diffusers ResnetBlock2D; model: models/vae.py). XLA keeps the GN
normalize+SiLU as a separate HBM pass because the conv needs global group
statistics before the elementwise apply; the profiled train step spends
~10% of its time in exactly these FLOP-free passes (PERF.md roofline).

This module fuses the normalize+affine+SiLU into the conv's INPUT READ:

    stats:  one Pallas reduce over x      -> per-(sample, group) mean/rstd
    kernel: read x window, z = a*x + o, s = silu(z), y = conv3x3(s) + bias
            (+ residual), write y          -> ONE pass instead of three

The conv is computed as three MXU matmuls per row-tile over a halo window
(left/center/right W-shifts concatenated to a (rows, 3*Cin) operand — the
measured-fastest Pallas formulation; experiments/conv_bench.py sweep). Halo
windows use ``pl.Element`` blocks; Mosaic supports only high out-of-bounds
padding, so the first row tile is realigned in-kernel with a zero row.

PRODUCTION STATUS (measured, PERF.md "Fused GN+SiLU+conv resnet kernels"):
the fused path wins standalone only at small spatial sizes (2.46x at
512ch@32px) and LOSES end-to-end even when gated to those shapes (406 vs
393 ms/step @256px) — XLA hides the norm behind its convs and custom-call
boundaries block fusion. The model therefore defaults to XLA; this kernel
is opt-in via ``model.kernel_impl: "fused"`` / ``ResnetBlock2D(impl=
"fused")``, fully tested and gradient-correct.

Side outputs (free during the same pass):
- per-channel sum of |z| — ``mean_abs_activation_per_channel`` of the GN
  output, the reference's hook metric (src/tracking/monitor.py:64-69),
  replacing its synchronous per-forward ``.detach().cpu()`` copies
  (src/models/sdxl_vae_wrapper.py:87).
- per-channel sum / sum-of-squares of the conv OUTPUT — the NEXT GroupNorm's
  statistics, so the follow-up norm needs no reduce pass over HBM.

Backward is a closed-form custom VJP (no saved normalized tensor, so the
fused path also uses less HBM than XLA's default):
    ds  = conv3x3(dy, w flipped/transposed)        [same Pallas conv kernel]
    dx, dgamma, dbeta = GroupNorm+SiLU backward    [pallas_group_norm kernels]
    dW  = per-offset matmul accumulation over row tiles, recomputing
          s = silu(a*x + o) in-registers           [dedicated Pallas kernel]
    db  = sum(dy); dresidual = dy

Layout contract: NHWC, bf16 or f32 IO, f32 statistics and accumulation,
Cin/Cout multiples of 128 (true for all SDXL-VAE resnet convs at 128-512
channels), H divisible by a row tile, W a multiple of the sublane width.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_group_norm import (
    LANE,
    _affine_coeffs,
    _bwd_channel_sums,
    _bwd_dx,
    _channel_sums,
    _group_stats,
    _interpret,
)


# ---------------------------------------------------------------------- #
# Mesh support: GSPMD cannot partition the fused custom calls, but the
# batch axis is embarrassingly parallel — installing the mesh here makes
# gn_silu_conv3x3 wrap itself in shard_map so each device runs the kernel
# on its LOCAL batch block (params replicated, batch-leading outputs
# sharded). Spatially-sharded meshes stay unsupported: a sharded H axis
# would need conv halo exchange the kernel does not implement.
# ---------------------------------------------------------------------- #
_SHARD_MESH: Optional[jax.sharding.Mesh] = None


def set_shard_mesh(mesh: Optional[jax.sharding.Mesh]) -> None:
    """Install (or clear, with None) the mesh for per-shard fused kernels.
    Call before tracing; traced programs bake the decision in."""
    global _SHARD_MESH
    _SHARD_MESH = mesh


def mesh_supported(mesh) -> bool:
    """True when every non-trivial mesh axis is the data axis."""
    return mesh is not None and all(
        name == "data" or size == 1 for name, size in dict(mesh.shape).items()
    )


def _shard_wrap(local, mesh, x, gamma, beta, w3, bias, residual):
    """Run ``local`` per-shard over the mesh's data axis: batch-leading
    tensors sharded, parameters replicated. Every differentiable value is
    an explicit argument (closed-over tracers and shard_map autodiff don't
    mix). All outputs (y, per-sample taps, per-sample moments) are
    batch-leading, so one sharded out_spec prefix covers the whole tree."""
    from jax.sharding import PartitionSpec as P

    batched, repl = P("data"), P()
    if residual is None:
        fn = jax.shard_map(
            lambda xs, g, b, w, bi: local(xs, g, b, w, bi, None),
            mesh=mesh,
            in_specs=(batched, repl, repl, repl, repl),
            out_specs=batched,
            check_vma=False,
        )
        return fn(x, gamma, beta, w3, bias)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(batched, repl, repl, repl, repl, batched),
        out_specs=batched,
        check_vma=False,
    )
    return fn(x, gamma, beta, w3, bias, residual)


def eligible(x: jax.Array, cout: int, num_groups: int) -> bool:
    """Fused path needs lane-aligned channels and tileable spatial dims —
    in BOTH directions: the backward's input-gradient conv runs the same
    row tiler with the channels swapped (``_conv_bwd_input`` convolves dy
    (…, cout) back to (…, cin)), so an asymmetric-channel shape whose
    forward tiles but whose swapped working set does not would pass a
    forward-only check and then die on the tiler assert under jax.grad."""
    if x.ndim != 4:
        return False
    _, h, w, cin = x.shape
    if cin % LANE or cout % LANE or cin % num_groups:
        return False
    if w % 16 or _pick_tile_h(h, w, cin, cout) is None:
        return False
    if _pick_tile_h(h, w, cout, cin) is None:
        return False
    return True


def _pick_tile_h(h: int, w: int, cin: int, cout: int) -> Optional[int]:
    """Largest row tile whose whole kernel working set fits Mosaic's ~16 MB
    scoped-VMEM budget: double-buffered bf16 halo windows, the full
    (3, 3Cin, Cout) weights, the f32 normalized window, the (tile_h+2, W,
    3Cin) shifted conv operand, the f32 accumulator, and double-buffered
    output/residual tiles (measured: the window-only estimate OOMed by 114 KB
    at 512ch/64px with residual+taps)."""
    w_bytes = 3 * 3 * cin * cout * 2
    for tile_h in (16, 8, 4, 2):
        if h % tile_h:
            continue
        win = (tile_h + 2) * w * cin  # halo window elements
        out = tile_h * w * cout
        est = (
            2 * win * 2        # double-buffered bf16 input windows
            + win * 4          # f32 normalized z
            + win * 2          # bf16 silu(z)
            + 3 * win * 2      # concatenated W-shift matmul operand
            + out * 4          # f32 accumulator
            + 4 * out * 2      # double-buffered bf16 y + residual tiles
            + w_bytes
        )
        if est <= 14_000_000:
            return tile_h
    return None


# --------------------------------------------------------------------------- #
# Forward kernel: y = conv3x3(silu(a*x + o)) [+ residual], plus side outputs
# --------------------------------------------------------------------------- #
def _fused_fwd_kernel(
    x_ref, a_ref, o_ref, w_ref, b_ref, *rest,
    tile_h: int, w_dim: int, cin: int, cout: int,
    with_residual: bool, emit_tap: bool, emit_moments: bool,
):
    refs = list(rest)
    res_ref = refs.pop(0) if with_residual else None
    y_ref = refs.pop(0)
    tap_ref = refs.pop(0) if emit_tap else None
    sum_ref = refs.pop(0) if emit_moments else None
    sq_ref = refs.pop(0) if emit_moments else None

    j = pl.program_id(1)
    n_h = pl.num_programs(1)
    win = x_ref[0]  # (tile_h+2, W, Cin); logical rows [j*tile_h-1, ...)
    # Mosaic supports only HIGH out-of-bounds padding on Element windows:
    # the first tile's window start clamps to 0 and arrives shifted up by
    # one row — realign with a zero row on top.
    shifted = jnp.concatenate([jnp.zeros_like(win[:1]), win[:-1]], axis=0)
    win = jnp.where(j == 0, shifted, win)
    row = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
    # rows outside the image must enter the conv as ZEROS — mask after the
    # affine (a zero x row would otherwise normalize to the offset `o`)
    valid = jnp.logical_and(
        jnp.logical_or(j > 0, row > 0),
        jnp.logical_or(j < n_h - 1, row < tile_h + 1),
    )

    # normalize + SiLU on the halo window (f32), conv operand in IO dtype
    z = win.astype(jnp.float32) * a_ref[0][None] + o_ref[0][None]
    z = jnp.where(valid, z, 0.0)
    s = (z * jax.nn.sigmoid(z)).astype(x_ref.dtype)

    if emit_tap:
        # |z| of the GN output over exactly the tile's own rows (the halo
        # rows belong to the neighboring tiles' taps)
        tap = jnp.sum(jnp.abs(z[1 : tile_h + 1]), axis=(0, 1))[None, None]

        @pl.when(j == 0)
        def _():
            tap_ref[...] = tap

        @pl.when(j > 0)
        def _():
            tap_ref[...] += tap

    zero_col = jnp.zeros_like(s[:, :1])
    left = jnp.concatenate([zero_col, s[:, :-1]], axis=1)
    right = jnp.concatenate([s[:, 1:], zero_col], axis=1)
    cat = jnp.concatenate([left, s, right], axis=-1)  # (tile_h+2, W, 3Cin)
    acc = jnp.zeros((tile_h * w_dim, cout), jnp.float32)
    for dy in range(3):
        operand = cat[dy : dy + tile_h].reshape(tile_h * w_dim, 3 * cin)
        acc = acc + jnp.dot(
            operand, w_ref[dy], preferred_element_type=jnp.float32
        )
    y = acc + b_ref[0].astype(jnp.float32)
    if with_residual:
        y = y + res_ref[0].astype(jnp.float32).reshape(tile_h * w_dim, cout)

    if emit_moments:
        ysum = jnp.sum(y, axis=0)[None, None]
        ysq = jnp.sum(y * y, axis=0)[None, None]

        @pl.when(j == 0)
        def _():
            sum_ref[...] = ysum
            sq_ref[...] = ysq

        @pl.when(j > 0)
        def _():
            sum_ref[...] += ysum
            sq_ref[...] += ysq

    y_ref[0] = y.reshape(tile_h, w_dim, cout).astype(y_ref.dtype)


def _fused_conv_fwd(
    x: jax.Array,
    a: jax.Array,
    o: jax.Array,
    w3: jax.Array,
    bias: jax.Array,
    residual: Optional[jax.Array],
    emit_tap: bool,
    emit_moments: bool,
):
    """x (N,H,W,Cin); a,o (N,Cin) f32; w3 (3, 3Cin, Cout); bias (Cout)."""
    n, h, wd, cin = x.shape
    cout = w3.shape[-1]
    tile_h = _pick_tile_h(h, wd, cin, cout)
    assert tile_h is not None, f"no row tile for {x.shape}"

    x_spec = pl.BlockSpec(
        (
            pl.Element(1),
            pl.Element(tile_h + 2, (0, 2)),
            pl.Element(wd),
            pl.Element(cin),
        ),
        lambda i, j: (i, jnp.maximum(j * tile_h - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    # per-sample vectors ride as (N, 1, C): Mosaic requires the 2nd-minor
    # block dim be 8-divisible or the FULL array dim, so (1, C) blocks of an
    # (N, C) array are rejected — a singleton middle axis satisfies it
    vec_in = lambda c: pl.BlockSpec(  # noqa: E731
        (1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        x_spec,
        vec_in(cin),
        vec_in(cin),
        pl.BlockSpec(
            (3, 3 * cin, cout), lambda i, j: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, a[:, None], o[:, None], w3, bias[None]]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, tile_h, wd, cout), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(residual)

    out_specs = [
        pl.BlockSpec(
            (1, tile_h, wd, cout), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    out_shape = [jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype)]
    vec_out = lambda c: pl.BlockSpec(  # noqa: E731
        (1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    if emit_tap:
        out_specs.append(vec_out(cin))
        out_shape.append(jax.ShapeDtypeStruct((n, 1, cin), jnp.float32))
    if emit_moments:
        out_specs.extend([vec_out(cout), vec_out(cout)])
        out_shape.extend([
            jax.ShapeDtypeStruct((n, 1, cout), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, cout), jnp.float32),
        ])

    outs = pl.pallas_call(
        functools.partial(
            _fused_fwd_kernel,
            tile_h=tile_h, w_dim=wd, cin=cin, cout=cout,
            with_residual=residual is not None,
            emit_tap=emit_tap, emit_moments=emit_moments,
        ),
        grid=(n, h // tile_h),
        interpret=_interpret(),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*operands)
    y = outs[0]
    idx = 1
    tap = outs[idx][:, 0] if emit_tap else None
    idx += int(emit_tap)
    moments = (
        (outs[idx][:, 0], outs[idx + 1][:, 0]) if emit_moments else None
    )
    return y, tap, moments


# --------------------------------------------------------------------------- #
# Backward kernels
# --------------------------------------------------------------------------- #
def _conv_bwd_input(dy: jax.Array, w3: jax.Array, cin: int) -> jax.Array:
    """ds = full-correlation of dy with w: conv3x3 of dy with the spatially
    flipped, channel-transposed kernel — the same fused kernel with identity
    normalization (a=1, o=0) and no SiLU is NOT reusable (SiLU is baked in),
    so this uses a dedicated plain-conv kernel below."""
    n, h, wd, cout = dy.shape
    # w3 (3, 3Cin, Cout) -> (3, 3, Cin, Cout) -> flip dy/dx, swap channels
    w4 = w3.reshape(3, 3, cin, cout)
    wt = jnp.flip(w4, axis=(0, 1)).transpose(0, 1, 3, 2)  # (3,3,Cout,Cin)
    wt3 = wt.reshape(3, 3 * cout, cin)
    return _plain_conv(dy, wt3, jnp.zeros((cin,), jnp.float32))


def _plain_conv_kernel(
    x_ref, w_ref, b_ref, y_ref, *, tile_h, w_dim, cin, cout
):
    j = pl.program_id(1)
    n_h = pl.num_programs(1)
    win = x_ref[0]
    shifted = jnp.concatenate([jnp.zeros_like(win[:1]), win[:-1]], axis=0)
    win = jnp.where(j == 0, shifted, win)
    row = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
    valid = jnp.logical_or(j < n_h - 1, row < tile_h + 1)
    win = jnp.where(valid, win, jnp.zeros_like(win))
    zero_col = jnp.zeros_like(win[:, :1])
    left = jnp.concatenate([zero_col, win[:, :-1]], axis=1)
    right = jnp.concatenate([win[:, 1:], zero_col], axis=1)
    cat = jnp.concatenate([left, win, right], axis=-1)
    acc = jnp.zeros((tile_h * w_dim, cout), jnp.float32)
    for dy in range(3):
        operand = cat[dy : dy + tile_h].reshape(tile_h * w_dim, 3 * cin)
        acc = acc + jnp.dot(
            operand, w_ref[dy], preferred_element_type=jnp.float32
        )
    acc = acc + b_ref[0].astype(jnp.float32)
    y_ref[0] = acc.reshape(tile_h, w_dim, cout).astype(y_ref.dtype)


def _plain_conv(x: jax.Array, w3: jax.Array, bias: jax.Array) -> jax.Array:
    n, h, wd, cin = x.shape
    cout = w3.shape[-1]
    tile_h = _pick_tile_h(h, wd, cin, cout)
    assert tile_h is not None, f"no row tile for {x.shape}"
    return pl.pallas_call(
        functools.partial(
            _plain_conv_kernel, tile_h=tile_h, w_dim=wd, cin=cin, cout=cout
        ),
        grid=(n, h // tile_h),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(tile_h + 2, (0, 2)),
                    pl.Element(wd),
                    pl.Element(cin),
                ),
                lambda i, j: (i, jnp.maximum(j * tile_h - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3 * cin, cout), lambda i, j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, wd, cout), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
    )(x, w3, bias[None])


def _dw_kernel(
    x_ref, a_ref, o_ref, g_ref, dw_ref, *,
    tile_h: int, w_dim: int, cin: int, cout_tile: int,
):
    """Accumulate dW[off, ci, co] += s_shifted(off)^T @ dy over row tiles,
    recomputing s = silu(a*x + o) from the x halo window in-registers.
    Grid (co_split, N, H_tiles); the (9-offset, Cin, co_tile) f32 accumulator
    is a revisited output block."""
    c_idx = pl.program_id(1)  # batch element
    j = pl.program_id(2)
    n_h = pl.num_programs(2)
    first = jnp.logical_and(c_idx == 0, j == 0)

    win = x_ref[0]
    shifted = jnp.concatenate([jnp.zeros_like(win[:1]), win[:-1]], axis=0)
    win = jnp.where(j == 0, shifted, win)
    row = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
    # out-of-image rows must contribute ZEROS post-affine (see fwd kernel)
    valid = jnp.logical_and(
        jnp.logical_or(j > 0, row > 0),
        jnp.logical_or(j < n_h - 1, row < tile_h + 1),
    )
    z = win.astype(jnp.float32) * a_ref[0][None] + o_ref[0][None]
    z = jnp.where(valid, z, 0.0)
    s = (z * jax.nn.sigmoid(z)).astype(x_ref.dtype)

    zero_col = jnp.zeros_like(s[:, :1])
    left = jnp.concatenate([zero_col, s[:, :-1]], axis=1)
    right = jnp.concatenate([s[:, 1:], zero_col], axis=1)
    cat = jnp.concatenate([left, s, right], axis=-1)  # (tile_h+2, W, 3Cin)
    g = g_ref[0].reshape(tile_h * w_dim, cout_tile)

    @pl.when(first)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for dy in range(3):
        operand = cat[dy : dy + tile_h].reshape(tile_h * w_dim, 3 * cin)
        contrib = jax.lax.dot_general(
            operand, g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3Cin, co_tile)
        dw_ref[dy] += contrib


def _pick_cout_split(cin: int, cout: int) -> int:
    """Output-channel split for the dW kernel: keep the f32 accumulator
    block under ~2.5 MB while keeping cout_tile LANE-aligned (Mosaic
    rejects non-lane-multiple block dims), so iterate over divisors of
    cout/LANE instead of blind halving — a halving loop would produce e.g.
    96 for cout=384, which compiles in interpret mode but fails to lower
    on real TPU."""
    n_lanes = cout // LANE
    for cand in range(1, n_lanes + 1):
        if n_lanes % cand:
            continue
        if 3 * 3 * cin * (cout // cand) * 4 <= 2_500_000:
            return cand
    return n_lanes  # fallback: minimal (LANE-wide) tile


def _conv_bwd_weights(
    x: jax.Array, a: jax.Array, o: jax.Array, dy: jax.Array
) -> jax.Array:
    """dW (3, 3Cin, Cout) f32, contracting s = silu(a*x+o) with dy."""
    n, h, wd, cin = x.shape
    cout = dy.shape[-1]
    tile_h = _pick_tile_h(h, wd, cin, cout)
    assert tile_h is not None
    co_split = _pick_cout_split(cin, cout)
    cout_tile = cout // co_split

    vec_in = lambda c: pl.BlockSpec(  # noqa: E731
        (1, 1, c), lambda co, i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    dw = pl.pallas_call(
        functools.partial(
            _dw_kernel, tile_h=tile_h, w_dim=wd, cin=cin, cout_tile=cout_tile
        ),
        grid=(co_split, n, h // tile_h),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(tile_h + 2, (0, 2)),
                    pl.Element(wd),
                    pl.Element(cin),
                ),
                lambda co, i, j: (i, jnp.maximum(j * tile_h - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            vec_in(cin),
            vec_in(cin),
            pl.BlockSpec(
                (1, tile_h, wd, cout_tile),
                lambda co, i, j: (i, j, 0, co),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, 3 * cin, cout_tile), lambda co, i, j: (0, 0, co),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, 3 * cin, cout), jnp.float32),
    )(x, a[:, None], o[:, None], dy)
    return dw


# --------------------------------------------------------------------------- #
# Public op with custom VJP
# --------------------------------------------------------------------------- #
@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9)
)
def _gn_silu_conv(
    x, gamma, beta, w3, bias, residual,
    num_groups, eps, emit_tap, emit_moments,
):
    outs, _ = _gn_silu_conv_fwd(
        x, gamma, beta, w3, bias, residual,
        num_groups, eps, emit_tap, emit_moments,
    )
    return outs


def _gn_silu_conv_fwd(
    x, gamma, beta, w3, bias, residual,
    num_groups, eps, emit_tap, emit_moments,
):
    n, h, wd, cin = x.shape
    x3 = x.reshape(n, h * wd, cin)
    sums, sqs = _channel_sums(x3)
    mean, rstd = _group_stats(sums[:, 0], sqs[:, 0], h * wd, num_groups, eps)
    a, o = _affine_coeffs(
        mean, rstd, gamma.astype(jnp.float32), beta.astype(jnp.float32),
        num_groups, cin,
    )
    y, tap, moments = _fused_conv_fwd(
        x, a, o, w3, bias, residual, emit_tap, emit_moments
    )
    # tap/moments are auxiliary statistics: non-differentiable by contract
    # (the trainer accumulates them outside the loss)
    outs = (y, tap, moments)
    # residual presence is encoded in pytree STRUCTURE (None vs ()), which
    # stays static through jit, unlike a bool leaf that would become traced
    has_res = None if residual is None else ()
    res = (x, gamma, mean, rstd, a, o, w3, has_res)
    return outs, res


def _gn_silu_conv_bwd(
    num_groups, eps, emit_tap, emit_moments, res, cotangents
):
    del emit_tap, emit_moments
    g_y = cotangents[0]  # gradients w.r.t. aux outputs are ignored
    x, gamma, mean, rstd, a, o, w3, has_res = res
    has_residual = has_res is not None
    n, h, wd, cin = x.shape
    cout = w3.shape[-1]
    hw = h * wd
    cg = cin // num_groups

    # ds = conv_bwd_input(dy, w); db = sum(dy)
    ds = _conv_bwd_input(g_y, w3, cin)
    db = jnp.sum(g_y.astype(jnp.float32), axis=(0, 1, 2))

    # dW from recomputed s
    dw = _conv_bwd_weights(x, a, o, g_y)

    # GroupNorm(+SiLU) backward via the existing Pallas kernels
    x3 = x.reshape(n, hw, cin)
    ds3 = ds.reshape(n, hw, cin)
    gsum, gxsum = _bwd_channel_sums(x3, ds3, a, o, fuse_silu=True)

    mean_c = jnp.repeat(mean, cg, axis=-1)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)
    dbeta = jnp.sum(gsum, axis=0)
    dgamma = jnp.sum((gxsum - mean_c * gsum) * rstd_c, axis=0)

    gamma_b = gamma.astype(jnp.float32)[None, :]
    d1 = jnp.sum((gamma_b * gsum).reshape(n, num_groups, cg), axis=-1)
    d2 = jnp.sum(
        (gamma_b * (gxsum - mean_c * gsum) * rstd_c).reshape(
            n, num_groups, cg
        ),
        axis=-1,
    )
    d1_c = jnp.repeat(d1, cg, axis=-1)
    d2_c = jnp.repeat(d2, cg, axis=-1)
    n_elems = hw * cg
    ca = a
    cb = -(rstd_c * rstd_c) * d2_c / n_elems
    cc = rstd_c * (mean_c * rstd_c * d2_c / n_elems - d1_c / n_elems)
    dx = _bwd_dx(x3, ds3, a, o, ca, cb, cc, fuse_silu=True)

    d_residual = g_y if has_residual else None
    return (
        dx.reshape(n, h, wd, cin),
        dgamma.astype(gamma.dtype),
        dbeta.astype(gamma.dtype),
        dw.astype(w3.dtype),
        db.astype(jnp.float32),
        d_residual,
    )


_gn_silu_conv.defvjp(_gn_silu_conv_fwd, _gn_silu_conv_bwd)


def gn_silu_conv3x3(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    *,
    num_groups: int = 32,
    eps: float = 1e-6,
    residual: Optional[jax.Array] = None,
    emit_tap: bool = False,
    emit_moments: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array], Optional[Tuple[jax.Array, jax.Array]]]:
    """``conv3x3(silu(group_norm(x)), kernel) + bias [+ residual]`` as fused
    Pallas TPU kernels (differentiable; aux outputs are stop-gradient).

    Args:
        x: (N, H, W, Cin) input, bf16 or f32.
        gamma, beta: (Cin,) GroupNorm affine.
        kernel: (3, 3, Cin, Cout) HWIO conv kernel (the model's parameter
            layout; reshaped internally to the matmul layout).
        bias: (Cout,).
        residual: optional (N, H, W, Cout) added to the conv output
            (the resnet skip — fused into the epilogue).
        emit_tap: also return per-channel mean|gn_output| (N, Cin) sums
            (divide by H*W for the per-sample mean, by N*H*W for the batch
            mean — the reference hook-metric convention).
        emit_moments: also return per-(sample, channel) sum and sum-of-
            squares of the conv output (the NEXT GroupNorm's statistics).

    Returns:
        (y, tap_abs_sums | None, (out_sum, out_sumsq) | None)
    """
    cin, cout = kernel.shape[2], kernel.shape[3]
    w3 = kernel.astype(x.dtype).reshape(3, 3 * cin, cout)

    def _local(xs, g, b, w, bi, res):
        return _gn_silu_conv(
            xs, g, b, w, bi, res,
            num_groups, float(eps), emit_tap, emit_moments,
        )

    mesh = _SHARD_MESH
    ndata = dict(mesh.shape).get("data", 1) if mesh is not None else 1
    if (
        mesh is not None
        and mesh_supported(mesh)
        and ndata > 1
        and x.shape[0] > 1
        and x.shape[0] % ndata != 0
    ):
        # Same trace-time guard as pallas_attention.flash_attention: falling
        # through to the unsharded kernel here would leave GSPMD an
        # unpartitionable custom call that all-gathers the global batch onto
        # every device — a silent memory/step-time regression that surfaces
        # only as an opaque compile-time HBM OOM at scale. Batch-1 traces
        # (module.init under an already-installed mesh) are exempt: a
        # 1-sample batch cannot be data-sharded by ANY mesh, so the local
        # kernel is the only correct program, not a stale-mesh accident.
        raise ValueError(
            f"gn_silu_conv3x3: installed shard mesh {dict(mesh.shape)} does "
            f"not divide the batch {x.shape[0]} — the caller traced with a "
            "mesh from a previous run? Install the right mesh (or clear it) "
            "with pallas_resnet.set_shard_mesh before tracing."
        )
    if (
        mesh is not None
        and mesh_supported(mesh)
        and ndata > 1
        and x.shape[0] % ndata == 0
    ):
        # per-shard execution on the local batch block (see set_shard_mesh)
        y, tap, moments = _shard_wrap(
            _local, mesh,
            x,
            gamma.astype(jnp.float32),
            beta.astype(jnp.float32),
            w3,
            bias.astype(jnp.float32),
            residual,
        )
    else:
        y, tap, moments = _local(
            x,
            gamma.astype(jnp.float32),
            beta.astype(jnp.float32),
            w3,
            bias.astype(jnp.float32),
            residual,
        )
    if tap is not None:
        tap = jax.lax.stop_gradient(tap)
    if moments is not None:
        moments = jax.lax.stop_gradient(moments)
    return y, tap, moments
