"""remat=offload on the chip: 1024px batch-1 train step A/B vs full/conv.

remat=offload keeps ``conv``'s saved set (conv outputs) but streams it to
pinned_host memory at forward time and back in the backward
(``save_and_offload_only_these_names``), so HBM holds only the block
inputs — ``full``'s footprint — while the backward pays PCIe transfers
instead of conv recompute. Whether that wins is bandwidth-vs-MXU
arithmetic: a 3x3 conv re-runs at ~9·C FLOPs per saved-output byte, so
the trade flips with channel count. This measures the three modes on the
identical 1024px batch-1 program (the VERDICT round-3 weak item: 32% MFU
under remat=full at the memory wall). Run via nohup + polling; also takes
a BENCH_RES env (default 1024) and a batch argv (default 1).

Reference anchor: the reference has no remat at all — its 1024px training
simply OOMs (SURVEY.md §6 perf baselines are 256px); this mode exists for
the stretch regime beyond reference capability.
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
    res = int(os.environ.get("BENCH_RES", "1024"))
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    modes = sys.argv[2:] or ["full", "conv", "offload"]
    cfg = VAEConfig.sdxl()
    module = AutoencoderKL(config=cfg, dtype=jnp.bfloat16)
    params_host = jax.device_get(module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    )["params"])
    rng = np.random.default_rng(0)
    batch_np = rng.uniform(-1, 1, (batch, res, res, 3)).astype(np.float32)
    mask = np.ones((batch,), np.float32)
    for mode in modes:
        remat = bench.parse_remat_env(mode)
        try:
            # fresh device buffers per mode: the jitted step donates the
            # state, deleting the previous mode's params arrays
            params = jax.device_put(params_host)
            step, state = bench.build_step(cfg, batch, res, (), params,
                                           remat=remat)
            dt, _ = bench.time_steps(
                step, state, {"pixel_values": batch_np}, mask,
                jax.random.PRNGKey(1), warmup=3, iters=10,
            )
            print(json.dumps({
                "case": "train", "resolution": res, "batch": batch,
                "remat": mode, "ms_per_step": round(float(dt) * 1e3, 1),
                "img_per_s": round(batch / float(dt), 2),
            }), flush=True)
        except Exception as e:  # OOM at this batch/mode is a data point
            print(json.dumps({
                "case": "train", "resolution": res, "batch": batch,
                "remat": mode, "error": f"{type(e).__name__}",
                "detail": str(e)[:300],
            }), flush=True)


if __name__ == "__main__":
    main()
