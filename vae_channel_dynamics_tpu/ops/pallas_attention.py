"""Pallas TPU flash-attention forward for the VAE mid block.

The mid block's single-head softmax attention (diffusers ``Attention``
reached via the reference's src/models/sdxl_vae_wrapper.py:42-77) has two
existing implementations in ops/attention.py, each with a measured downside
at 1024px (PERF.md "Mid-block attention at 1024px"):

  * ``naive`` materializes the full fp32 logits matrix — 8.59 GB of HBM
    transient at batch 8 / 16384 tokens — but is the latency winner at
    small batch (XLA does not row-fuse the inference softmax);
  * ``chunked`` (lax.scan online softmax) is O(N*chunk) memory but ~30%
    slower at batch 1: every scan step round-trips its fp32 accumulators
    (m, l, acc — 33 MB at 16384x512) through HBM.

This kernel removes the trade-off: one fused Pallas kernel computes the
FlashAttention forward with the (block_q, block_k) logits tile and the
fp32 running max / denominator / numerator all resident in VMEM — the
quadratic buffer never exists and the accumulators never touch HBM. Memory
is O(N*block) like ``chunked``; speed target is ``naive`` or better.

Numerics match ``chunked_attention`` (same online-softmax recurrence, fp32
accumulators, probabilities cast to the compute dtype before the PV matmul)
up to float reassociation of the block reduction order.

Backward: fused Pallas kernels (FlashAttention-2 style). The forward-for-
training variant additionally emits the per-row log-sum-exp; the backward
rematerializes each (block_q, block_k) probability tile from (q, k, lse) in
VMEM and accumulates dK/dV (one kernel, keys outer / queries inner) and dQ
(one kernel, queries outer / keys inner) in fp32 scratch. No O(N^2) buffer
ever exists and — unlike the previous delegated ``chunked_attention`` VJP —
nothing round-trips the fp32 accumulators through HBM per chunk, which is
what made ``flash`` +1.3% on a 1024px train step instead of a win.

Mesh: GSPMD cannot partition the custom call, but the batch axis is
embarrassingly parallel — ``set_shard_mesh`` (same pattern as
ops/pallas_resnet.py) makes ``flash_attention`` wrap itself in ``shard_map``
over the data axis so each device runs the kernel on its local batch block.
On a spatially-sharded mesh the token axis itself is split: each shard
all-gathers K/V along ``spatial`` (16 MB each at 1024px — cheap on ICI) and
runs the kernel over its local query rows; softmax rows are independent, so
this is exact sequence parallelism, and the all-gather transposes to a
reduce-scatter in the backward automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_group_norm import LANE, _interpret

# Finite stand-in for -inf (see ops/attention.py): exp(_MASKED - m)
# underflows to 0 for any real m without the (-inf) - (-inf) NaN.
_MASKED = -1e30

# Largest (block_q == block_k) tile whose working set fits Mosaic's ~16 MB
# scoped-VMEM budget at C=512: double-buffered bf16 q/k/v blocks (3 MB),
# the fp32 logits tile (1 MB at 512), fp32 acc (1 MB) + m/l strips, and the
# double-buffered output block. 1024 would push the logits tile alone to
# 4 MB and the total past the budget.
_BLOCKS = (512, 256, 128)


def _pick_block(n: int) -> Optional[int]:
    for b in _BLOCKS:
        if n % b == 0:
            return b
    return None


def eligible(num_tokens: int, channels: int) -> bool:
    """Kernel constraints: lane-aligned channels and a block size dividing
    the token count (every SDXL/SD mid block at >=64px qualifies: C=512,
    N=(res/8)^2 is a multiple of 128 for res a multiple of 64). Under an
    installed spatially-sharded mesh the per-shard query rows
    (num_tokens / spatial) must be block-divisible too.

    TRACE-ORDER HAZARD: the answer reads the module-global mesh installed by
    :func:`set_shard_mesh`, and jit bakes it into the trace — a function
    traced BEFORE the mesh is installed keeps the non-mesh-aware decision
    (the jit cache is not keyed on the global). The Trainer installs the
    mesh before any tracing; direct library users must do the same.
    :func:`flash_attention` additionally asserts block-divisibility of the
    per-shard rows at trace time, so a stale ``eligible()`` verdict fails
    loudly instead of lowering an invalid kernel."""
    if channels % LANE != 0 or _pick_block(num_tokens) is None:
        return False
    mesh = _SHARD_MESH
    if mesh is not None:
        if not mesh_supported(mesh):
            # a non-data/spatial axis (multi-slice) would leave the custom
            # call unpartitioned under GSPMD or route K/V over DCN
            return False
        sp = int(dict(mesh.shape).get("spatial", 1))
        if sp > 1 and (
            num_tokens % sp or _pick_block(num_tokens // sp) is None
        ):
            return False
    return True


# --------------------------------------------------------------------- #
# Mesh support (same mechanism as pallas_resnet.set_shard_mesh)
# --------------------------------------------------------------------- #
_SHARD_MESH: Optional[jax.sharding.Mesh] = None


def set_shard_mesh(mesh: Optional[jax.sharding.Mesh]) -> None:
    """Install (or clear, with None) the mesh for per-shard flash attention.
    Call before tracing; traced programs bake the decision in."""
    global _SHARD_MESH
    _SHARD_MESH = mesh


def mesh_supported(mesh) -> bool:
    """True when every non-trivial mesh axis is ``data`` or ``spatial``.
    ``data`` shards the batch (embarrassingly parallel); a sharded spatial
    axis splits the token dimension, handled by sequence parallelism (local
    query rows attend over all-gathered K/V — see ``flash_attention``).
    Multi-slice meshes still fall back: the slice axis would route the K/V
    gather over DCN, where chunked's in-graph scan is the better program."""
    return mesh is not None and all(
        name in ("data", "spatial") or size == 1
        for name, size in dict(mesh.shape).items()
    )


# --------------------------------------------------------------------- #
# Kernel
# --------------------------------------------------------------------- #
def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *rest, scale: float, precision):
    if len(rest) == 4:          # training variant: also emit log-sum-exp
        lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        lse_ref = None
        m_ref, l_ref, acc_ref = rest
    kidx = pl.program_id(2)

    @pl.when(kidx == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _MASKED)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qb = q_ref[0]  # (block_q, C)
    kb = k_ref[0]  # (block_k, C)
    vb = v_ref[0]
    s = jax.lax.dot_general(
        qb, kb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) * scale  # (block_q, block_k) fp32, VMEM-resident only

    m_prev = m_ref[...][:, :1]
    l_prev = l_ref[...][:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(qb.dtype), vb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    acc_ref[...] = acc_ref[...] * corr + pv
    # m/l live as (block_q, LANE) strips (last dim must be lane-width for
    # full-block stores); only column 0 is meaningful.
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kidx == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[...][:, :1]).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0] = m_ref[...] + jnp.log(l_ref[...])


def _flash_forward(q, k, v, scale, out_dtype, precision, *, with_lse=False):
    b, nq, c = q.shape
    nk = k.shape[1]
    bq = _pick_block(nq)
    bk = _pick_block(nk)
    if bq is None or bk is None or c % LANE != 0:
        # Reached when a trace predates set_shard_mesh() and a mesh later
        # splits the rows below block divisibility (see eligible()): fail
        # at trace time with the cause, not inside Mosaic.
        raise ValueError(
            f"flash attention ineligible for local shape q={q.shape} "
            f"k={k.shape}: rows must divide a block in {_BLOCKS} and "
            f"channels must be a multiple of {LANE}. If this appears under "
            "shard_map, eligible() was consulted before set_shard_mesh() "
            "installed the mesh."
        )
    grid = (b, nq // bq, nk // bk)  # k innermost: accumulators persist
    kernel = functools.partial(_flash_kernel, scale=scale, precision=precision)
    itemsize = jnp.dtype(q.dtype).itemsize
    out_shape = [jax.ShapeDtypeStruct((b, nq, c), out_dtype)]
    out_specs = [pl.BlockSpec((1, bq, c), lambda i, j, kx: (i, j, 0),
                              memory_space=pltpu.VMEM)]
    if with_lse:
        # Per-row log-sum-exp as a (B, N, LANE) strip (all columns equal):
        # the lane-width last dim keeps stores full-block and lets the
        # backward kernels read it with the same BlockSpec shape as q.
        out_shape.append(jax.ShapeDtypeStruct((b, nq, LANE), jnp.float32))
        out_specs.append(pl.BlockSpec((1, bq, LANE),
                                      lambda i, j, kx: (i, j, 0),
                                      memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j, kx: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, c), lambda i, j, kx: (i, kx, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, c), lambda i, j, kx: (i, kx, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, LANE), jnp.float32),  # running max
            pltpu.VMEM((bq, LANE), jnp.float32),  # running denominator
            pltpu.VMEM((bq, c), jnp.float32),     # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nq * nk * c,
            bytes_accessed=itemsize * b * c * (2 * nq + 2 * nk)
            + jnp.dtype(out_dtype).itemsize * b * nq * c,
            transcendentals=b * nq * nk,
        ),
    )(q, k, v)
    return tuple(out) if with_lse else out[0]


# --------------------------------------------------------------------- #
# Backward (FlashAttention-2): rematerialize each probability tile from
# (q, k, lse) and accumulate the three gradients in fp32 VMEM scratch.
# Two kernels because dK/dV accumulate over query blocks while dQ
# accumulates over key blocks — each wants its reduction axis innermost so
# the scratch accumulator persists across the whole reduction.
# --------------------------------------------------------------------- #

# Smaller tiles than the forward: the backward holds four (block, C) input
# blocks, two fp32 (block, C) accumulators and four fp32 (bq, bk) tiles at
# once. 256 keeps the working set ~6 MB at C=512. Every element divides
# every forward block, so forward eligibility implies backward eligibility.
_BWD_BLOCKS = (256, 128)


def _pick_bwd_block(n: int) -> Optional[int]:
    for b in _BWD_BLOCKS:
        if n % b == 0:
            return b
    return None


def _bwd_tile(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
              scale, precision):
    """The shared per-tile math: rebuild p, dp, ds for one (bq, bk) tile."""
    qb = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    dob = do_ref[0]
    lse = lse_ref[0][:, :1]      # (bq, 1) fp32
    delta = delta_ref[0][:, :1]  # (bq, 1) fp32 = rowsum(do * o)
    s = jax.lax.dot_general(
        qb, kb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) * scale
    p = jnp.exp(s - lse)  # (bq, bk) fp32 — exact softmax, no running max
    dp = jax.lax.dot_general(
        dob, vb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    ds = p * (dp - delta) * scale  # d(loss)/d(s_scaled) * scale folded in
    return qb, kb, dob, p, ds


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, dqa_ref, *, scale: float, precision):
    kidx = pl.program_id(2)

    @pl.when(kidx == 0)
    def _():
        dqa_ref[...] = jnp.zeros_like(dqa_ref)

    qb, kb, _, _, ds = _bwd_tile(
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, scale, precision)
    dqa_ref[...] += jax.lax.dot_general(
        ds.astype(qb.dtype), kb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(kidx == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = dqa_ref[...].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dka_ref, dva_ref,
                          *, scale: float, precision):
    qidx = pl.program_id(2)

    @pl.when(qidx == 0)
    def _():
        dka_ref[...] = jnp.zeros_like(dka_ref)
        dva_ref[...] = jnp.zeros_like(dva_ref)

    qb, _, dob, p, ds = _bwd_tile(
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, scale, precision)
    # dv += p^T @ do ; dk += ds^T @ q — contraction over the query rows,
    # expressed with dimension numbers so no explicit transpose relayout.
    dva_ref[...] += jax.lax.dot_general(
        p.astype(qb.dtype), dob, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    dka_ref[...] += jax.lax.dot_general(
        ds.astype(qb.dtype), qb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(qidx == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dka_ref[...].astype(dk_ref.dtype)
        dv_ref[0] = dva_ref[...].astype(dv_ref.dtype)


def _flash_backward(q, k, v, do, lse, delta, scale, precision):
    b, nq, c = q.shape
    nk = k.shape[1]
    bq = _pick_bwd_block(nq)
    bk = _pick_bwd_block(nk)
    itemsize = jnp.dtype(q.dtype).itemsize

    q_spec = pl.BlockSpec((1, bq, c), lambda i, j, kx: (i, kx, 0),
                          memory_space=pltpu.VMEM)
    strip = pl.BlockSpec((1, bq, LANE), lambda i, j, kx: (i, kx, 0),
                         memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, bk, c), lambda i, j, kx: (i, j, 0),
                           memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale,
                          precision=precision),
        grid=(b, nk // bk, nq // bq),  # queries innermost: dk/dv persist
        interpret=_interpret(),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, strip, strip],
        out_specs=[kv_spec, kv_spec],
        out_shape=[jax.ShapeDtypeStruct((b, nk, c), k.dtype),
                   jax.ShapeDtypeStruct((b, nk, c), v.dtype)],
        scratch_shapes=[pltpu.VMEM((bk, c), jnp.float32),
                        pltpu.VMEM((bk, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * b * nq * nk * c,
            bytes_accessed=itemsize * b * c * 2 * (nq + nk)
            + itemsize * b * c * (nq + 2 * nk),
            transcendentals=b * nq * nk,
        ),
    )(q, k, v, do, lse, delta)

    q_spec2 = pl.BlockSpec((1, bq, c), lambda i, j, kx: (i, j, 0),
                           memory_space=pltpu.VMEM)
    strip2 = pl.BlockSpec((1, bq, LANE), lambda i, j, kx: (i, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, bk, c), lambda i, j, kx: (i, kx, 0),
                            memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale,
                          precision=precision),
        grid=(b, nq // bq, nk // bk),  # keys innermost: dq persists
        interpret=_interpret(),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, strip2, strip2],
        out_specs=q_spec2,
        out_shape=jax.ShapeDtypeStruct((b, nq, c), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * nq * nk * c,
            bytes_accessed=itemsize * b * c * (2 * nq + 2 * nk)
            + itemsize * b * nq * c,
            transcendentals=b * nq * nk,
        ),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, scale, out_dtype, precision):
    return _flash_forward(q, k, v, scale, out_dtype, precision)


def _flash_fwd(q, k, v, scale, out_dtype, precision):
    o, lse = _flash_forward(q, k, v, scale, out_dtype, precision,
                            with_lse=True)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, out_dtype, precision, res, g):
    q, k, v, o, lse = res
    # delta_i = sum_c do_ic * o_ic (FlashAttention-2's D): one fused
    # elementwise pass XLA folds into the strip broadcast; the kernels then
    # never need o itself.
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)
    delta = jnp.broadcast_to(delta, (*delta.shape[:2], LANE))
    dq, dk, dv = _flash_backward(
        q, k, v, g.astype(q.dtype), lse, delta, scale, precision)
    return dq, dk, dv


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    out_dtype: Any,
    precision: jax.lax.Precision,
) -> jax.Array:
    """Single-head ``softmax(q @ k^T * scale) @ v`` via the fused kernel.

    Same signature and semantics as ``chunked_attention``. Inputs are
    ``(batch, tokens, channels)``; the caller must check :func:`eligible`
    (which is mesh-aware once :func:`set_shard_mesh` is installed).
    Under an installed data mesh the kernel runs per-shard via shard_map;
    a spatially-sharded mesh additionally goes sequence-parallel (local
    query rows over all-gathered K/V).
    """
    mesh = _SHARD_MESH
    if mesh is not None and mesh_supported(mesh) and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        axes = dict(mesh.shape)
        data = "data" if int(axes.get("data", 1)) > 1 else None
        sp = "spatial" if int(axes.get("spatial", 1)) > 1 else None
        # eligible() cannot see the batch (it takes tokens/channels only),
        # so a mesh whose data axis does not divide the batch — typically a
        # stale mesh left installed by an earlier model in the same process
        # — would otherwise surface as a cryptic shard_map divisibility
        # error. Fail at trace time with the actual cause.
        if data is not None and q.shape[0] % int(axes["data"]):
            raise ValueError(
                f"flash attention: installed shard mesh {dict(mesh.shape)} "
                f"does not divide the batch ({q.shape[0]} % {axes['data']} "
                "!= 0). If this model is not meant to run sharded, a stale "
                "mesh is installed — clear it with set_shard_mesh(None)."
            )
        if sp is not None and q.shape[1] % int(axes["spatial"]):
            raise ValueError(
                f"flash attention: installed shard mesh {dict(mesh.shape)} "
                f"does not divide the token rows ({q.shape[1]} % "
                f"{axes['spatial']} != 0); eligible() was consulted before "
                "set_shard_mesh() installed this mesh."
            )

        def local(q_, k_, v_):
            if sp is not None:
                # Sequence parallelism: softmax rows are independent, so
                # each shard runs the kernel on its local query rows over
                # the full gathered keys/values (16 MB each at 1024px —
                # one ICI all-gather per operand; it transposes to a
                # reduce-scatter for dK/dV in the backward automatically).
                k_ = jax.lax.all_gather(k_, sp, axis=1, tiled=True)
                v_ = jax.lax.all_gather(v_, sp, axis=1, tiled=True)
            return _flash_attention(q_, k_, v_, scale, out_dtype, precision)

        spec = P(data, sp)
        fn = jax.shard_map(
            local, mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=spec, check_vma=False,
        )
        return fn(q, k, v)
    return _flash_attention(q, k, v, scale, out_dtype, precision)
