"""1024px attention A/B on the real chip: naive vs chunked mid-block attention.

At 1024px the SDXL mid block attends over 128*128 = 16384 tokens; the naive
path materializes a ~1 GB fp32 logits tensor per image (per mid block, and
the encoder + decoder each have one). ops/attention.py streams key chunks
with online softmax at O(N*chunk) memory. This measures, per case:

  * train step (remat from VCD_ATTN_REMAT, default full — the known 1024px
    regime, PERF.md) at batch 1 and 2 for both attention impls;
  * deterministic forward at batch 1 and 2 for both impls.

Batch 2 with naive attention is the previously-OOM point; any case that
OOMs is reported, not fatal. Prints one JSON line per case. Run via
nohup + polling (1024px full-remat compiles take ~5-10 min each through
the tunnel).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (repo-root bench: timing harness + builders)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402

RES = int(os.environ.get("VCD_ATTN_RES", "1024"))
REMAT = os.environ.get("VCD_ATTN_REMAT", "full")
ARCH = os.environ.get("VCD_ATTN_ARCH", "sdxl")  # tiny = CPU smoke test
BATCHES = tuple(
    int(b) for b in os.environ.get("VCD_ATTN_BATCHES", "1,2").split(",")
)
CASES = tuple(os.environ.get("VCD_ATTN_CASES", "train,fwd").split(","))
IMPLS = tuple(os.environ.get("VCD_ATTN_IMPLS", "chunked,naive").split(","))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main() -> int:
    cfg = getattr(VAEConfig, ARCH)()
    module0 = AutoencoderKL(config=cfg, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, 64, 64, 3))
    params_host = jax.device_get(
        module0.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            sample,
            sample_posterior=False,
        )["params"]
    )
    rng = jax.random.PRNGKey(2)

    cases = []
    for attn in IMPLS:
        for batch in BATCHES:
            for kind in CASES:
                cases.append((kind, attn, batch))

    for kind, attn, batch in cases:
        t0 = time.time()
        data = params = step = state = fwd = None
        try:
            data_np = (
                np.random.default_rng(0)
                .uniform(-1, 1, (batch, RES, RES, 3))
                .astype(np.float32)
            )
            params = jax.device_put(params_host)
            if kind == "train":
                data = jax.device_put(data_np)
                mask = jnp.ones(batch, jnp.float32)
                step, state = bench.build_step(
                    cfg, batch, RES, (), params, REMAT, attn_impl=attn
                )
                dt, _ = bench.time_steps(
                    step, state, {"pixel_values": data}, mask, rng,
                    warmup=2, iters=6,
                )
            else:
                data = jax.device_put(jnp.asarray(data_np, jnp.bfloat16))
                fwd = bench.build_forward(cfg, params, attn_impl=attn)
                dt = bench.time_forward(fwd, params, data, warmup=2, iters=6)
            emit(case=kind, attn=attn, batch=batch, res=RES, remat=REMAT,
                 ms_per_step=round(dt * 1e3, 1),
                 img_per_s=round(batch / dt, 2),
                 wall_s=round(time.time() - t0, 1))
        except Exception as e:  # noqa: BLE001 — OOM cases are data points here
            emit(case=kind, attn=attn, batch=batch, res=RES, remat=REMAT,
                 error=f"{type(e).__name__}: {str(e)[:300]}",
                 wall_s=round(time.time() - t0, 1))
        finally:
            data = params = step = state = fwd = None  # noqa: F841
            bench._release()
    return 0


if __name__ == "__main__":
    sys.exit(main())
