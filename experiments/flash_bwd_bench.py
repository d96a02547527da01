"""Standalone attention fwd+bwd timing, on the chip.

Isolates what the fused Pallas flash BACKWARD (ops/pallas_attention.py,
FlashAttention-2 dK/dV + dQ kernels) buys over the previous delegated
chunked-recompute VJP: one value_and_grad step over the bare attention op at
the 1024px SDXL mid-block shape (16384 tokens, 512 channels, bf16).

Chain-differenced like bench.py (dispatch/fetch latency through the tunnel
dwarfs op time): each chained step feeds dQ back in as the next Q, so the
device never idles between iterations. Run via nohup + polling.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from vae_channel_dynamics_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import time  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vae_channel_dynamics_tpu.ops.attention import chunked_attention  # noqa: E402
from vae_channel_dynamics_tpu.ops.pallas_attention import flash_attention  # noqa: E402


def _naive(q, k, v, *, scale, out_dtype, precision):
    logits = jnp.einsum(
        "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32,
        precision=precision,
    ) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(out_dtype)
    return jnp.einsum(
        "bqk,bkc->bqc", attn, v, preferred_element_type=out_dtype,
        precision=precision,
    )


IMPLS = {"naive": _naive, "chunked": chunked_attention, "flash": flash_attention}


def time_grad(fn, q, k, v, scale, warmup=3, iters=10):
    kw = dict(scale=scale, out_dtype=q.dtype,
              precision=jax.lax.Precision.DEFAULT)

    @jax.jit
    def grad_step(q, k, v):
        def loss(q, k, v):
            out = fn(q, k, v, **kw)
            return jnp.sum(out.astype(jnp.float32))

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def run_chain(n):
        t0 = time.perf_counter()
        q_, k_, v_ = q, k, v
        for _ in range(n):
            dq, dk, dv = grad_step(q_, k_, v_)
            q_ = dq  # chain: next step consumes this one's output
        _ = float(jax.device_get(jnp.sum(q_.astype(jnp.float32))))
        return time.perf_counter() - t0

    run_chain(warmup)
    t1 = run_chain(2)
    t2 = run_chain(2 + iters)
    return (t2 - t1) / iters


def main():
    c = 512
    scale = 1.0 / np.sqrt(c)
    # (batch, tokens): the 1024px mid-block shape (16384), the 512px shape
    # (4096) and the 256px shape (1024) at training-relevant batch sizes —
    # the auto-policy table rows. Override with BENCH_CASES="b:t,b:t,...".
    import os
    env = os.environ.get("BENCH_CASES", "")
    cases = (
        tuple(tuple(int(x) for x in c_.split(":")) for c_ in env.split(","))
        if env
        else ((1, 16384), (8, 16384), (1, 4096), (8, 4096),
              (8, 1024), (24, 1024))
    )
    for batch, tokens in cases:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (
            jax.random.normal(kk, (batch, tokens, c), jnp.bfloat16)
            for kk in ks
        )
        for name, fn in IMPLS.items():
            if name == "naive" and batch * tokens * tokens * 4 > 4e9:
                # multi-GB fp32 logits held TWICE through the naive backward
                # (forward residual + recompute) — OOMs the chip; skip
                print(json.dumps({
                    "case": "attn_grad", "impl": name, "tokens": tokens,
                    "batch": batch, "skipped": "OOM (O(N^2) residuals)",
                }), flush=True)
                continue
            dt = time_grad(fn, q, k, v, scale)
            print(json.dumps({
                "case": "attn_grad", "impl": name, "tokens": tokens,
                "batch": batch, "ms_per_step": round(dt * 1e3, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
