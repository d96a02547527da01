"""Batch-size x remat sweep of the 256px SDXL-VAE train step on the chip.

Question: is there throughput left above the production batch 24 — does a
bigger batch (amortizing the fixed per-step optimizer/elementwise work)
or remat=conv (freeing HBM so an even bigger batch fits) beat the
measured 61 img/s?

Usage: nohup python experiments/batch_sweep.py > /tmp/sweep.log 2>&1 &
Prints one line per (batch, remat) and a JSON summary.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(batch: int, remat: str) -> int:
    from vae_channel_dynamics_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_step, time_steps
    from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig.sdxl()
    resolution = 256
    rng = jax.random.PRNGKey(0)
    module = AutoencoderKL(config=cfg, dtype=jnp.bfloat16)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, resolution, resolution, 3)),
        sample_posterior=False,
    )["params"]
    data = {
        "pixel_values": np.random.default_rng(0)
        .uniform(-1, 1, (batch, resolution, resolution, 3))
        .astype(np.float32)
    }
    mask = np.ones(batch, np.float32)
    step, state = build_step(
        cfg, batch, resolution, (), params,
        remat if remat != "none" else False,
    )
    dt, state = time_steps(step, state, data, mask, rng, warmup=2, iters=6)
    print(f"RESULT {batch/dt:.2f} {dt*1e3:.1f}", flush=True)
    return 0


def main() -> int:
    # one subprocess per case: device buffers from earlier cases otherwise
    # pin HBM and OOM later ones (observed in-process: b16 then b24 OOMs)
    results = {}
    for remat in ("none", "conv"):
        for batch in (16, 24, 32, 48, 64):
            key = f"b{batch}_remat-{remat}"
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--one", str(batch), remat],
                capture_output=True, text=True, timeout=3600, cwd=REPO,
            )
            line = [
                l for l in proc.stdout.splitlines() if l.startswith("RESULT ")
            ]
            if proc.returncode == 0 and line:
                ips, ms = line[-1].split()[1:3]
                results[key] = float(ips)
                print(f"# {key}: {ms} ms/step, {ips} img/s", flush=True)
            else:
                tail = (proc.stdout + proc.stderr)[-400:]
                results[key] = "OOM" if "RESOURCE_EXHAUSTED" in (
                    proc.stdout + proc.stderr
                ) else "failed"
                print(f"# {key}: {results[key]} ({tail[-120:]!r})", flush=True)
    print(json.dumps({"metric": "batch_remat_sweep@256px", **results}))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        sys.exit(run_one(int(sys.argv[2]), sys.argv[3]))
    sys.exit(main())
