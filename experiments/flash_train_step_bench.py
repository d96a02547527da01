"""Flash attention in the 1024px TRAIN step, on the chip.

Completes the kernel's training story: PERF.md has naive 674.7 and chunked
680.7 ms/step (SDXL @1024px, batch 1, bf16, remat full); this measures
attention_impl=flash on the identical program (flash forward kernel + the
fused Pallas FlashAttention-2 backward: the dK/dV and dQ kernel pair in
ops/pallas_attention.py, not the old chunked-delegated VJP). Reuses
bench.py's step builder and chain-differenced timer. BENCH_REMAT env
(full|conv|none, default full) selects the remat mode. Run via nohup +
polling.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from vae_channel_dynamics_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402


def main():
    cfg = VAEConfig.sdxl()
    module = AutoencoderKL(config=cfg, dtype=jnp.bfloat16)
    params_host = jax.device_get(module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    )["params"])
    rng = np.random.default_rng(0)
    batch_np = rng.uniform(-1, 1, (1, 1024, 1024, 3)).astype(np.float32)
    mask = np.ones((1,), np.float32)
    remat = bench.parse_remat_env(os.environ.get("BENCH_REMAT", "full"))
    impls = sys.argv[1:] or ["flash"]
    for attn_impl in impls:
        # fresh device buffers per impl: the jitted step donates the state,
        # deleting the previous impl's params arrays
        params = jax.device_put(params_host)
        step, state = bench.build_step(
            cfg, 1, 1024, (), params, remat=remat, attn_impl=attn_impl,
        )
        dt, _ = bench.time_steps(
            step, state, {"pixel_values": batch_np}, mask,
            jax.random.PRNGKey(1), warmup=3, iters=10,
        )
        ms = dt * 1e3
        print(json.dumps({
            "case": "train", "impl": attn_impl, "resolution": 1024,
            "batch": 1, "remat": remat, "ms_per_step": round(float(ms), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
