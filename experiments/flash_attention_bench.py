"""Flash-attention kernel on the real chip vs the naive and chunked paths.

Measures, at the 1024px SDXL mid-block shape (16384 tokens, 512 channels,
bf16 — the shape whose naive logits temp is 8.59 GB at batch 8, PERF.md):

  * op-level: softmax attention wall time per call (chain-length
    differencing: the output shape equals q's, so outputs chain into the
    next call's query) and XLA memory_analysis temp bytes, for
    naive / chunked / flash at batch 1 and 8;
  * model-level: full SDXL deterministic reconstruct @1024px batch 1 with
    attention_impl=flash (naive 103.2 ms and chunked 134.2 ms are already
    measured in PERF.md — one more ~5-10 min tunnel compile buys the flash
    point).

Run via nohup + polling (tunnel compiles are minutes). One JSON line per
case. VCD_FLASH_CASES=op / model selects a subset.
"""

import json
import math
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from vae_channel_dynamics_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vae_channel_dynamics_tpu.ops.attention import chunked_attention  # noqa: E402
from vae_channel_dynamics_tpu.ops.pallas_attention import (  # noqa: E402
    eligible,
    flash_attention,
)

N = int(os.environ.get("VCD_FLASH_N", "16384"))
C = int(os.environ.get("VCD_FLASH_C", "512"))
BATCHES = tuple(int(b) for b in os.environ.get("VCD_FLASH_B", "1,8").split(","))
CASES = os.environ.get("VCD_FLASH_CASES", "op,model").split(",")
ITERS = int(os.environ.get("VCD_FLASH_ITERS", "10"))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def _naive(q, k, v, scale, dtype, prec):
    logits = jnp.einsum(
        "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32,
        precision=prec,
    ) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum(
        "bqk,bkc->bqc", attn, v, preferred_element_type=dtype, precision=prec,
    )


def op_bench():
    assert eligible(N, C)
    scale = 1.0 / math.sqrt(C)
    prec = jax.lax.Precision.DEFAULT
    impls = {
        "naive": lambda q, k, v: _naive(q, k, v, scale, jnp.bfloat16, prec),
        "chunked": lambda q, k, v: chunked_attention(
            q, k, v, scale=scale, out_dtype=jnp.bfloat16, precision=prec
        ),
        "flash": lambda q, k, v: flash_attention(
            q, k, v, scale=scale, out_dtype=jnp.bfloat16, precision=prec
        ),
    }
    for b in BATCHES:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (
            jax.random.normal(kk, (b, N, C), jnp.bfloat16) * 0.1 for kk in ks
        )
        for name, fn in impls.items():
            tag = dict(case="op", impl=name, batch=b, tokens=N, channels=C)
            try:
                jfn = jax.jit(fn)
                compiled = jfn.lower(q, k, v).compile()
                mem = compiled.memory_analysis()
                temp = getattr(mem, "temp_size_in_bytes", None)

                def chain(n):
                    t0 = time.perf_counter()
                    x = q
                    for _ in range(n):
                        x = jfn(x, k, v)
                    float(jax.device_get(jnp.sum(x.astype(jnp.float32))))
                    return time.perf_counter() - t0

                chain(3)
                t1 = chain(2)
                t2 = chain(2 + ITERS)
                ms = (t2 - t1) / ITERS * 1e3
                emit(**tag, ms_per_call=round(ms, 3),
                     temp_gb=None if temp is None else round(temp / 2**30, 3))
            except Exception as e:  # noqa: BLE001
                emit(**tag, error=f"{type(e).__name__}: {e}",
                     tb=traceback.format_exc()[-1500:])


def model_bench():
    from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig.sdxl()
    module = AutoencoderKL(config=cfg, dtype=jnp.bfloat16, attn_impl="flash")
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    )["params"]

    @jax.jit
    def fwd(params, pixels):
        out = module.apply({"params": params}, pixels, sample_posterior=False)
        return out["reconstruction"]

    mb = int(os.environ.get("VCD_FLASH_MODEL_B", "1"))
    x = jax.random.uniform(jax.random.PRNGKey(1), (mb, 1024, 1024, 3),
                           jnp.bfloat16)
    tag = dict(case="model", impl="flash", resolution=1024, batch=mb)
    try:
        t0 = time.time()
        compiled = fwd.lower(params, x).compile()
        compile_s = time.time() - t0
        mem = compiled.memory_analysis()
        temp = getattr(mem, "temp_size_in_bytes", None)

        def chain(n):
            t0 = time.perf_counter()
            y = x
            for _ in range(n):
                y = fwd(params, y)
            float(jax.device_get(jnp.sum(y.astype(jnp.float32))))
            return time.perf_counter() - t0

        chain(3)
        t1 = chain(2)
        t2 = chain(2 + ITERS)
        ms = (t2 - t1) / ITERS * 1e3 / mb
        emit(**tag, ms_per_image=round(ms, 2), compile_s=round(compile_s, 1),
             temp_gb=None if temp is None else round(temp / 2**30, 3))
    except Exception as e:  # noqa: BLE001
        emit(**tag, error=f"{type(e).__name__}: {e}",
             tb=traceback.format_exc()[-1500:])


def main():
    emit(event="start", platform=jax.devices()[0].platform,
         n=N, c=C, batches=list(BATCHES), cases=CASES)
    if "op" in CASES:
        op_bench()
    if "model" in CASES:
        model_bench()
    emit(event="done")


if __name__ == "__main__":
    main()
