"""Fused GroupNorm(+SiLU) Pallas TPU kernels with custom VJP.

The SDXL-VAE runs GroupNorm(32) + SiLU before every conv; at 256px the
largest instances normalize (B, 256, 256, 128) tensors, so the op is HBM
bandwidth bound. This implementation makes exactly two passes over the
activation in the forward (one reduce, one normalize) and two in the
backward, with fp32 statistics regardless of IO dtype, and fuses the
trailing SiLU into the normalize pass (XLA usually fuses these too; the
kernel guarantees it and keeps the pass structure fixed for profiling).

Layout: NHWC with C a multiple of 128 (the TPU lane width) — true for every
SDXL-VAE norm (128/256/512 channels). The spatial dims are flattened to an
(HW, C) matrix per sample; the grid walks (batch, HW chunks) with the chunk
axis innermost so per-channel accumulators in the (B, C) outputs are
revisited sequentially (TPU grid execution order guarantee).

Channel->group reduction (C -> 32 groups) is a tiny (B, C) matmul handled by
XLA between the kernels; fusing it in-kernel would save nothing measurable.

Forward:  kernel 1: per-channel sum / sum-of-squares       (read x)
          XLA:      group mean/rstd -> per-channel scale_hat/bias_hat
          kernel 2: y = silu(x * scale_hat + bias_hat)     (read x, write y)
Backward: kernel 1: per-channel sum(g_eff), sum(g_eff * x) (read x, g)
          XLA:      per-group/channel coefficients; dgamma, dbeta
          kernel 2: dx = g_eff * a_g + x * b_c + c_c       (read x, g, write dx)
where g_eff folds the SiLU derivative when fused.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def eligible(x: jax.Array, num_groups: int, impl: str) -> bool:
    """Use the Pallas path only on TPU with lane-aligned channels."""
    if x.ndim != 4:
        return False
    c = x.shape[-1]
    hw = x.shape[1] * x.shape[2]
    if c % LANE != 0 or c % num_groups != 0 or hw % 8 != 0:
        return False
    if impl == "pallas":
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False



def _interpret() -> bool:
    """Interpreter mode off-TPU (CPU-mesh tests exercise the same kernels)."""
    try:
        return jax.devices()[0].platform != "tpu"
    except RuntimeError:
        return True

def _chunk_for(hw: int, c: int) -> int:
    """Largest power-of-two chunk dividing hw that keeps an fp32
    (chunk, C) working tile within ~256KB — the backward kernel holds two
    such tiles (x and g) plus double-buffered bf16 input blocks, which must
    fit Mosaic's 16MB scoped-VMEM budget at C=512."""
    budget_elems = 65536  # 256 KB fp32
    cap = max(8, budget_elems // max(c, 1))
    for chunk in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if chunk <= cap and hw % chunk == 0:
            return chunk
    return hw


# --------------------------------------------------------------------------- #
# Forward kernels
# --------------------------------------------------------------------------- #
def _reduce_kernel(x_ref, sum_ref, sq_ref):
    j = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)  # (chunk, C)
    s = jnp.sum(xf, axis=0, keepdims=True)[None]  # (1, 1, C)
    q = jnp.sum(xf * xf, axis=0, keepdims=True)[None]

    @pl.when(j == 0)
    def _():
        sum_ref[...] = s
        sq_ref[...] = q

    @pl.when(j > 0)
    def _():
        sum_ref[...] += s
        sq_ref[...] += q


def _channel_sums(x3: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, HW, C) -> per-(sample, channel) sum and sum-of-squares, fp32."""
    b, hw, c = x3.shape
    chunk = _chunk_for(hw, c)
    grid = (b, hw // chunk)
    return pl.pallas_call(
        _reduce_kernel,
        grid=grid,
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec(
                (1, chunk, c), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
    )(x3)


def _normalize_kernel(x_ref, a_ref, b_ref, y_ref, *, fuse_silu: bool):
    xf = x_ref[0].astype(jnp.float32)  # (chunk, C)
    y = xf * a_ref[0] + b_ref[0]
    if fuse_silu:
        y = y * jax.nn.sigmoid(y)
    y_ref[0] = y.astype(y_ref.dtype)


def _normalize_stats_kernel(x_ref, a_ref, b_ref, y_ref, abs_ref,
                            *, fuse_silu: bool):
    """Normalize pass that additionally emits the per-channel |z| running
    sum of the PRE-SiLU norm output as a side output — per-channel
    activation statistics for free during the write pass (the in-kernel
    replacement for the reference's hook metric
    mean_abs_activation_per_channel, src/tracking/monitor.py:64-69; the
    hook observes the norm module's output, before the separate SiLU)."""
    j = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)
    z = xf * a_ref[0] + b_ref[0]
    y = z * jax.nn.sigmoid(z) if fuse_silu else z
    y_ref[0] = y.astype(y_ref.dtype)
    s = jnp.sum(jnp.abs(z), axis=0, keepdims=True)[None]  # (1, 1, C)

    @pl.when(j == 0)
    def _():
        abs_ref[...] = s

    @pl.when(j > 0)
    def _():
        abs_ref[...] += s


def _apply_normalize(
    x3: jax.Array, a: jax.Array, b: jax.Array, fuse_silu: bool,
    with_abs_stats: bool = False,
):
    bsz, hw, c = x3.shape
    chunk = _chunk_for(hw, c)
    grid = (bsz, hw // chunk)
    mat_in = pl.BlockSpec(
        (1, chunk, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    vec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    if not with_abs_stats:
        return pl.pallas_call(
            functools.partial(_normalize_kernel, fuse_silu=fuse_silu),
            grid=grid,
            interpret=_interpret(),
            in_specs=[mat_in, vec, vec],
            out_specs=mat_in,
            out_shape=jax.ShapeDtypeStruct((bsz, hw, c), x3.dtype),
        )(x3, a[:, None], b[:, None])
    y, abs_sum = pl.pallas_call(
        functools.partial(_normalize_stats_kernel, fuse_silu=fuse_silu),
        grid=grid,
        interpret=_interpret(),
        in_specs=[mat_in, vec, vec],
        out_specs=[mat_in, vec],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hw, c), x3.dtype),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
        ],
    )(x3, a[:, None], b[:, None])
    return y, abs_sum[:, 0]


def _group_stats(
    sums: jax.Array, sqs: jax.Array, hw: int, num_groups: int, eps: float
) -> Tuple[jax.Array, jax.Array]:
    """(B, C) channel sums -> per-(sample, group) mean and rstd."""
    b, c = sums.shape
    cg = c // num_groups
    n = hw * cg
    gsum = jnp.sum(sums.reshape(b, num_groups, cg), axis=-1)
    gsq = jnp.sum(sqs.reshape(b, num_groups, cg), axis=-1)
    mean = gsum / n
    var = gsq / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    return mean, rstd


def _affine_coeffs(mean, rstd, scale, bias, num_groups, c):
    """Fold GN statistics and affine into per-(sample, channel) a, b with
    y = x * a + b."""
    b = mean.shape[0]
    cg = c // num_groups
    mean_c = jnp.repeat(mean, cg, axis=-1)  # (B, C)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)
    a = rstd_c * scale[None, :]
    off = bias[None, :] - mean_c * a
    return a.astype(jnp.float32), off.astype(jnp.float32)


# --------------------------------------------------------------------------- #
# Backward kernels
# --------------------------------------------------------------------------- #
def _bwd_reduce_kernel(x_ref, g_ref, a_ref, b_ref, gsum_ref, gxsum_ref,
                       *, fuse_silu: bool):
    j = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)
    gf = g_ref[0].astype(jnp.float32)
    if fuse_silu:
        z = xf * a_ref[0] + b_ref[0]
        sig = jax.nn.sigmoid(z)
        gf = gf * (sig * (1.0 + z * (1.0 - sig)))
    s_g = jnp.sum(gf, axis=0, keepdims=True)[None]
    s_gx = jnp.sum(gf * xf, axis=0, keepdims=True)[None]

    @pl.when(j == 0)
    def _():
        gsum_ref[...] = s_g
        gxsum_ref[...] = s_gx

    @pl.when(j > 0)
    def _():
        gsum_ref[...] += s_g
        gxsum_ref[...] += s_gx


def _bwd_dx_kernel(x_ref, g_ref, a_ref, b_ref, ca_ref, cb_ref, cc_ref, dx_ref,
                   *, fuse_silu: bool):
    xf = x_ref[0].astype(jnp.float32)
    gf = g_ref[0].astype(jnp.float32)
    if fuse_silu:
        z = xf * a_ref[0] + b_ref[0]
        sig = jax.nn.sigmoid(z)
        gf = gf * (sig * (1.0 + z * (1.0 - sig)))
    dx = gf * ca_ref[0] + xf * cb_ref[0] + cc_ref[0]
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _bwd_channel_sums(x3, g3, a, b, fuse_silu):
    bsz, hw, c = x3.shape
    chunk = _chunk_for(hw, c)
    grid = (bsz, hw // chunk)
    vec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec(
        (1, chunk, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    gsum, gxsum = pl.pallas_call(
        functools.partial(_bwd_reduce_kernel, fuse_silu=fuse_silu),
        grid=grid,
        interpret=_interpret(),
        in_specs=[mat, mat, vec, vec],
        out_specs=[vec, vec],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
        ],
    )(x3, g3, a[:, None], b[:, None])
    return gsum[:, 0], gxsum[:, 0]


def _bwd_dx(x3, g3, a, b, ca, cb, cc, fuse_silu):
    bsz, hw, c = x3.shape
    chunk = _chunk_for(hw, c)
    grid = (bsz, hw // chunk)
    vec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec(
        (1, chunk, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_bwd_dx_kernel, fuse_silu=fuse_silu),
        grid=grid,
        interpret=_interpret(),
        in_specs=[mat, mat, vec, vec, vec, vec, vec],
        out_specs=mat,
        out_shape=jax.ShapeDtypeStruct((bsz, hw, c), x3.dtype),
    )(x3, g3, a[:, None], b[:, None], ca[:, None], cb[:, None], cc[:, None])


# --------------------------------------------------------------------------- #
# Public op with custom VJP
# --------------------------------------------------------------------------- #
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _group_norm_silu(x3, scale, bias, num_groups, eps, fuse_silu):
    y, _res = _fwd(x3, scale, bias, num_groups, eps, fuse_silu)
    return y


def _fwd(x3, scale, bias, num_groups, eps, fuse_silu):
    bsz, hw, c = x3.shape
    sums, sqs = _channel_sums(x3)
    sums, sqs = sums[:, 0], sqs[:, 0]
    mean, rstd = _group_stats(sums, sqs, hw, num_groups, eps)
    a, b = _affine_coeffs(mean, rstd, scale, bias, num_groups, c)
    y = _apply_normalize(x3, a, b, fuse_silu)
    return y, (x3, scale, bias, mean, rstd, a, b)


def _bwd(num_groups, eps, fuse_silu, res, g3):
    x3, scale, bias, mean, rstd, a, b = res
    bsz, hw, c = x3.shape
    cg = c // num_groups
    n = hw * cg

    gsum, gxsum = _bwd_channel_sums(x3, g3, a, b, fuse_silu)  # (B, C) fp32

    mean_c = jnp.repeat(mean, cg, axis=-1)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)
    # parameter grads: dbeta = sum_b,hw g_eff ; dgamma = sum g_eff * x_hat
    dbeta = jnp.sum(gsum, axis=0)
    dgamma = jnp.sum((gxsum - mean_c * gsum) * rstd_c, axis=0)

    # dx = rstd*gamma*g_eff - [per-group terms]
    # d1_g = sum_c_in_g gamma_c * g_eff_sum_c
    # d2_g = sum_c_in_g gamma_c * (gx_sum_c - mean*g_sum_c) * rstd  (= sum g_eff*gamma*x_hat)
    gamma_g = scale[None, :]
    d1 = jnp.sum(
        (gamma_g * gsum).reshape(bsz, num_groups, cg), axis=-1
    )  # (B, G)
    d2 = jnp.sum(
        (gamma_g * (gxsum - mean_c * gsum) * rstd_c).reshape(bsz, num_groups, cg),
        axis=-1,
    )
    d1_c = jnp.repeat(d1, cg, axis=-1)  # (B, C)
    d2_c = jnp.repeat(d2, cg, axis=-1)
    # dx = a*g_eff + x * cb + cc   with
    #   cb = -rstd^2/n * d2 * gamma_scale-part folded:
    # derive: x_hat = (x - mean) * rstd
    # dx = rstd*(gamma*g_eff - d1/n - x_hat*d2/n)
    #    = (rstd*gamma)*g_eff + x * (-rstd^2*d2/n) + (rstd*(mean*rstd*d2/n - d1/n))
    ca = a  # rstd_c * gamma
    cb = -(rstd_c * rstd_c) * d2_c / n
    cc = rstd_c * (mean_c * rstd_c * d2_c / n - d1_c / n)

    dx = _bwd_dx(
        x3, g3, a, b,
        ca.astype(jnp.float32), cb.astype(jnp.float32), cc.astype(jnp.float32),
        fuse_silu,
    )
    return dx, dgamma.astype(scale.dtype), dbeta.astype(bias.dtype)


def _fwd_rule(x3, scale, bias, num_groups, eps, fuse_silu):
    y, res = _fwd(x3, scale, bias, num_groups, eps, fuse_silu)
    return y, res


_group_norm_silu.defvjp(_fwd_rule, _bwd)


def group_norm_silu(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-6,
    fuse_silu: bool = False,
) -> jax.Array:
    """NHWC GroupNorm(+SiLU) via the fused Pallas kernels (differentiable)."""
    b, h, w, c = x.shape
    x3 = x.reshape(b, h * w, c)
    y = _group_norm_silu(
        x3, scale.astype(jnp.float32), bias.astype(jnp.float32),
        num_groups, float(eps), bool(fuse_silu),
    )
    return y.reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _group_norm_silu_stats(x3, scale, bias, num_groups, eps, fuse_silu):
    out, _res = _fwd_stats(x3, scale, bias, num_groups, eps, fuse_silu)
    return out


def _fwd_stats(x3, scale, bias, num_groups, eps, fuse_silu):
    bsz, hw, c = x3.shape
    sums, sqs = _channel_sums(x3)
    sums, sqs = sums[:, 0], sqs[:, 0]
    mean, rstd = _group_stats(sums, sqs, hw, num_groups, eps)
    a, b = _affine_coeffs(mean, rstd, scale, bias, num_groups, c)
    y, abs_sum = _apply_normalize(x3, a, b, fuse_silu, with_abs_stats=True)
    return (y, abs_sum), (x3, scale, bias, mean, rstd, a, b)


def _bwd_stats(num_groups, eps, fuse_silu, res, cotangents):
    # the |z| side output is an auxiliary statistic: non-differentiable by
    # contract (the trainer accumulates it outside the loss)
    g3, _g_stats = cotangents
    return _bwd(num_groups, eps, fuse_silu, res, g3)


_group_norm_silu_stats.defvjp(_fwd_stats, _bwd_stats)


def group_norm_silu_with_stats(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-6,
    fuse_silu: bool = False,
):
    """GroupNorm(+SiLU) that also returns
    ``mean_abs_activation_per_channel`` of the PRE-SiLU norm output,
    computed INSIDE the normalize kernel's write pass (zero extra memory
    traffic). Differentiable w.r.t. ``x``/``scale``/``bias`` (the stat is
    stop-gradient). Returns ``(y, mean_abs)`` with ``mean_abs`` shape (C,),
    averaged over batch and spatial positions — the reference hook-metric
    convention (monitor.py:64-69: the hook is on the norm module, whose
    output precedes the separate SiLU). Wired into ``VGroupNorm`` for
    ``impl="pallas"`` output taps, where it keeps the norm+SiLU fusion that
    the XLA path must split when tapped."""
    b, h, w, c = x.shape
    x3 = x.reshape(b, h * w, c)
    y, abs_sum = _group_norm_silu_stats(
        x3, scale.astype(jnp.float32), bias.astype(jnp.float32),
        num_groups, float(eps), bool(fuse_silu),
    )
    # abs_sum is per-sample (B, C): weight by the installed batch-validity
    # mask (ops/stats.tap_mask) like the XLA taps and the fused resnet
    # kernels, so remainder-batch pad duplicates carry zero weight
    from .stats import mask_for

    m = mask_for(abs_sum)
    summed = jax.lax.stop_gradient(
        jnp.sum(abs_sum, axis=0) if m is None
        else jnp.sum(abs_sum * m[:, None], axis=0)
    )
    denom = (
        float(b * h * w) if m is None
        else jnp.maximum(jnp.sum(m), 1.0) * float(h * w)
    )
    return y.reshape(b, h, w, c), summed / denom
