"""Memory-bounded attention for the VAE mid block.

The reference model's mid-block self-attention (diffusers ``Attention`` inside
``AutoencoderKL``, reached via src/models/sdxl_vae_wrapper.py:42-77) is a
single-head softmax attention over all spatial positions. Materializing the
full logits matrix is O(N^2) memory: at 1024px the SDXL mid block attends over
N = 128*128 = 16384 tokens, so the fp32 logits tensor alone is ~1 GB *per
image* — the dominant single buffer at the 1024px memory wall (PERF.md).

``chunked_attention`` computes the identical result (up to float
reassociation) with FlashAttention-style online softmax over key chunks:

  * live memory is O(N * chunk) — 16x less at 16384 tokens with chunk=1024;
  * every scan step is ``jax.checkpoint``-ed, so the backward pass recomputes
    each chunk's logits instead of saving them (without this, ``lax.scan``
    residuals would re-materialize the full O(N^2) across steps);
  * the matmuls stay large and MXU-shaped (N x chunk x C per step);
  * the softmax accumulators (running max / denominator / numerator) are kept
    in fp32, which is slightly *more* accurate than the naive path's
    "softmax in fp32, then cast probabilities to compute dtype" ordering.

This is the TPU-idiomatic answer to the problem the reference never hits (its
largest configured resolution is 256px): compiler-friendly ``lax.scan`` +
rematerialization rather than a hand-scheduled kernel. The attention FLOPs are
~1.3% of a 1024px train step, so the ~2x recompute on them is noise while the
memory relief is what unlocks larger per-chip batches.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Finite stand-in for -inf: exp(-1e30 - m) underflows to 0 for any real m,
# but never produces the NaN that (-inf) - (-inf) would in the first step.
_MASKED = -1e30

# Auto policy: naive attention up to this many tokens (<=512px mid block for
# the SDXL /8 downsampling); above it the quadratic logits buffer is the
# 1024px memory wall and auto switches to a streaming impl — the fused
# Pallas flash kernel when its shape/mesh constraints hold (measured faster
# than chunked at every >4096-token point, fwd AND fused-backward: PERF.md
# "Fused Pallas flash attention"), chunked otherwise. Keeps the measured
# <=512px programs byte-identical.
AUTO_CHUNK_THRESHOLD = 4096
# Serving-only refinement: batched forward-only calls are measured flash-
# fastest already AT 4096 tokens (1.61 vs 4.27 ms at batch 8; the batch-1
# delta is -0.07 ms on a ~50 ms model call), so the serving resolver
# upgrades auto at >= this count rather than > (PERF.md token-count sweep).
SERVING_FLASH_MIN_TOKENS = 4096
# Above the token threshold, training ``auto`` still picks naive when the
# backward's quadratic residual (batch * tokens^2 * 4 bytes fp32) fits this
# budget: the in-model A/B at the 1024px wall (SDXL train step, batch 1,
# remat full, PERF.md "Fused flash BACKWARD") measures naive 673.9 ms vs
# chunked 685.6 — the residual (1.07 GB at b1/16384) is worth paying when it
# fits. 1.25 GiB admits exactly the measured point; 2x it (batch 2 @1024px)
# is a measured compile-time HBM OOM for the whole model either way. The
# batch here is the TRACE-time global batch, so multi-chip meshes (where the
# per-device residual would be batch/N of this) stay conservatively chunked
# — only the measured single-chip regime changes.
NAIVE_BWD_RESIDUAL_BUDGET_BYTES = int(1.25 * 2**30)
DEFAULT_CHUNK = 1024


def chunked_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    out_dtype: Any,
    precision: jax.lax.Precision,
    chunk: int = DEFAULT_CHUNK,
) -> jax.Array:
    """Single-head softmax attention, online over key chunks.

    Args:
      q, k, v: ``(batch, tokens, channels)`` in the model compute dtype.
      scale: logit scale (``1/sqrt(channels)`` for the VAE mid block).
      out_dtype: dtype of the returned array.
      precision: matmul precision (HIGHEST at fp32 for torch parity,
        DEFAULT at bf16 — same policy as the naive path).
      chunk: key-chunk length; clamped to the key count. Keys are
        zero-padded to a multiple of ``chunk`` and masked, so any token
        count works.

    Returns:
      ``softmax(q @ k^T * scale) @ v`` of shape ``(batch, tokens, channels)``.
    """
    b, nq, c = q.shape
    nk = k.shape[1]
    chunk = max(1, min(chunk, nk))
    pad = (-nk) % chunk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    steps = (nk + pad) // chunk
    # scan carries iterate over the leading axis: (steps, b, chunk, c)
    kc = jnp.moveaxis(k.reshape(b, steps, chunk, c), 1, 0)
    vc = jnp.moveaxis(v.reshape(b, steps, chunk, c), 1, 0)
    if pad:
        valid = (jnp.arange(steps * chunk) < nk).reshape(steps, 1, 1, chunk)
    else:
        valid = None

    def body(carry, inp):
        m, l, acc = carry
        if valid is None:
            kb, vb = inp
        else:
            kb, vb, mask = inp
        s = (
            jnp.einsum(
                "bqc,bkc->bqk", q, kb,
                preferred_element_type=jnp.float32, precision=precision,
            )
            * scale
        )
        if valid is not None:
            s = jnp.where(mask, s, _MASKED)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum(
            "bqk,bkc->bqc", p.astype(q.dtype), vb,
            preferred_element_type=jnp.float32, precision=precision,
        )
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((b, nq, 1), _MASKED, jnp.float32),
        jnp.zeros((b, nq, 1), jnp.float32),
        jnp.zeros((b, nq, c), jnp.float32),
    )
    xs = (kc, vc) if valid is None else (kc, vc, valid)
    (m, l, acc), _ = jax.lax.scan(
        jax.checkpoint(body, prevent_cse=False), init, xs
    )
    return (acc / l).astype(out_dtype)


def resolve_impl(
    attn_impl: str,
    num_tokens: int,
    channels: Optional[int] = None,
    batch: Optional[int] = None,
) -> str:
    """THE shared ``attention_impl`` policy for TRAINING traces (the model
    default; forward-only surfaces use :func:`resolve_serving_impl`).
    Explicit impls pass through; ``auto`` resolves per the chip-measured
    table (PERF.md "Fused Pallas flash attention"; 1024px SDXL train step,
    batch 1, remat full, round-4 re-measurement with the fused backward):

    | tokens  | resolution (SDXL /8) | auto    | why (measured) |
    |---------|----------------------|---------|----------------|
    | <= 4096 | <= 512px             | naive   | fastest fwd+bwd at batch 1, ties flash at batch 8 (4096tok b8 grad: 7.73 vs 7.91 ms); quadratic buffer fits |
    | > 4096, residual fits | 1024px @ batch 1 | naive | the backward's B*N^2*4-byte residual (1.07 GB at b1/16384) fits ``NAIVE_BWD_RESIDUAL_BUDGET_BYTES`` and naive measures 673.9 vs chunked 685.6 ms in-model — requires ``batch`` (the model passes its trace-time batch; ``batch=None`` stays conservative) |
    | > 4096, residual too big (or batch unknown) | > 512px | chunked | O(N*chunk) memory for +1.7% step time; flash measures 748.6 ms IN-MODEL despite winning at the op level (grads 14.6 vs chunked 17.6 ms b1/16384) — the custom-call boundaries in the rematerialized backward cost more than the kernels save |

    ``flash`` therefore remains opt-in for training; it IS the serving
    default above 4096 tokens (see :func:`resolve_serving_impl`), where it
    wins at every measured point. ``channels`` only matters to the serving
    resolver and to explicit-``flash`` eligibility fallbacks."""
    if attn_impl in ("naive", "chunked", "flash"):
        return attn_impl
    if attn_impl != "auto":
        raise ValueError(
            f"Unknown attention_impl {attn_impl!r}; "
            "expected 'auto', 'naive', 'chunked' or 'flash'."
        )
    if num_tokens <= AUTO_CHUNK_THRESHOLD:
        return "naive"
    # The residual-budget rule needs a CONCRETE batch: under jax.export a
    # symbolic batch dim (jax.export.symbolic_shape) reaches here and any
    # inequality on it raises InconclusiveDimensionOperation (true at b=1,
    # false at b>=2). Symbolic/unknown batches stay conservatively chunked.
    if (
        isinstance(batch, (int, np.integer))
        and batch * num_tokens * num_tokens * 4
        <= NAIVE_BWD_RESIDUAL_BUDGET_BYTES
    ):
        return "naive"
    return "chunked"


def resolve_serving_impl(
    attn_impl: str, num_tokens: int, channels: Optional[int] = None
) -> str:
    """The shared ``auto`` policy for FORWARD-ONLY traces (serve/server/
    evaluate CLIs): flash from 4096 tokens up when the kernel's shape and
    installed-mesh constraints hold (``pallas_attention.eligible``), the
    training policy otherwise. Chip-measured (PERF.md): flash is fastest at
    every batched forward point — 1.61 vs naive 4.27 ms at 4096 tokens b8,
    26.95 vs 42.5 ms at 16384 b8, full-model 1024px 100.3 vs chunked
    134.2 ms/image — and eliminates naive's multi-GB logits transient. The
    batch-1 4096-token delta (naive 0.104 vs flash 0.178 ms) is noise on a
    ~50 ms model call, so no batch knob."""
    if attn_impl == "auto" and num_tokens >= SERVING_FLASH_MIN_TOKENS:
        if channels is not None:
            from . import pallas_attention

            if pallas_attention.eligible(num_tokens, channels):
                return "flash"
    return resolve_impl(attn_impl, num_tokens, channels)


def use_chunked(attn_impl: str, num_tokens: int) -> bool:
    """Back-compat boolean view of :func:`resolve_impl` (pre-``flash``)."""
    return resolve_impl(attn_impl, num_tokens) == "chunked"
