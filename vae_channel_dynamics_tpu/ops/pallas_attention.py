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

Backward: a custom VJP delegates to ``chunked_attention``'s gradient, which
is already memory-bounded via per-chunk rematerialization — so ``flash``
is safe to select for training, while its win is the forward/serving path.

Mesh: GSPMD cannot partition the custom call, but the batch axis is
embarrassingly parallel — ``set_shard_mesh`` (same pattern as
ops/pallas_resnet.py) makes ``flash_attention`` wrap itself in ``shard_map``
over the data axis so each device runs the kernel on its local batch block.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import chunked_attention
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
    N=(res/8)^2 is a multiple of 128 for res a multiple of 64)."""
    return channels % LANE == 0 and _pick_block(num_tokens) is not None


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
    """True when every non-trivial mesh axis is the data axis (a sharded
    spatial axis would split the token dimension mid-softmax)."""
    return mesh is not None and all(
        name == "data" or size == 1 for name, size in dict(mesh.shape).items()
    )


# --------------------------------------------------------------------- #
# Kernel
# --------------------------------------------------------------------- #
def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float, precision):
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


def _flash_forward(q, k, v, scale, out_dtype, precision):
    b, nq, c = q.shape
    nk = k.shape[1]
    bq = _pick_block(nq)
    bk = _pick_block(nk)
    grid = (b, nq // bq, nk // bk)  # k innermost: accumulators persist
    kernel = functools.partial(_flash_kernel, scale=scale, precision=precision)
    itemsize = jnp.dtype(q.dtype).itemsize
    return pl.pallas_call(
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
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j, kx: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nq, c), out_dtype),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, scale, out_dtype, precision):
    return _flash_forward(q, k, v, scale, out_dtype, precision)


def _flash_fwd(q, k, v, scale, out_dtype, precision):
    return _flash_forward(q, k, v, scale, out_dtype, precision), (q, k, v)


def _flash_bwd(scale, out_dtype, precision, res, g):
    # The chunked scan path computes the identical math with per-chunk
    # rematerialization, so its VJP is already O(N*chunk) memory — reuse it
    # rather than hand-writing dQ/dK/dV kernels for an op that is ~1.3% of
    # a 1024px train step (PERF.md).
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: chunked_attention(
            q_, k_, v_, scale=scale, out_dtype=out_dtype, precision=precision,
        ),
        q, k, v,
    )
    return vjp(g)


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
    ``(batch, tokens, channels)``; the caller must check :func:`eligible`.
    Under an installed data mesh the kernel runs per-shard via shard_map.
    """
    mesh = _SHARD_MESH
    if mesh is not None and mesh_supported(mesh) and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(
            lambda q_, k_, v_: _flash_attention(
                q_, k_, v_, scale, out_dtype, precision
            ),
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
        return fn(q, k, v)
    return _flash_attention(q, k, v, scale, out_dtype, precision)
