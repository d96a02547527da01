"""ZeRO-stack cost on the chip: ms/step replicated vs ZeRO-1 vs ZeRO-1+EMA
vs ZeRO-3 (SDXL @256px, bf16, AdamW, batch from BENCH_BATCH or 16).

On the single chip the shardings are degenerate (1 shard per leaf) but the
reshard/gather code paths — sharding constraints on the optimizer update,
the post-update params all-gather schedule XLA compiles from the
annotations, the EMA blend on sharded copies — still execute, so this
quantifies the overhead the annotations themselves add to the compiled
step (the claim in STATUS.md was "nearly zero extra collective volume",
previously unmeasured). The multi-device distribution/parity behavior is
separately pinned by the CPU-mesh tests (tests/test_zero.py).

Chain-differenced timing like bench.py. Run via nohup + polling.
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
from vae_channel_dynamics_tpu.parallel import make_mesh  # noqa: E402
from vae_channel_dynamics_tpu.parallel.mesh import replicated_sharding  # noqa: E402
from vae_channel_dynamics_tpu.parallel.zero import state_shardings  # noqa: E402
from vae_channel_dynamics_tpu.training import (  # noqa: E402
    TrainState,
    build_optimizer,
    make_train_step,
)

CASES = (
    # (label, shard_optimizer, shard_ema, shard_params, ema_decay)
    ("replicated", False, False, False, 0.0),
    ("zero1", True, False, False, 0.0),
    ("zero1+ema", True, True, False, 0.999),
    ("zero3", True, True, True, 0.999),
)


def main():
    cfg = VAEConfig.sdxl()
    resolution = int(os.environ.get("BENCH_RESOLUTION", "256"))
    # BENCH_BATCH (singular): this bench measures ONE batch size per run —
    # a bench.py-style BENCH_BATCHES list would silently drop all but the
    # first value, so reject it loudly instead.
    batch_env = os.environ.get("BENCH_BATCH", "16")
    if "," in batch_env or "BENCH_BATCHES" in os.environ:
        raise SystemExit(
            "zero_bench measures a single batch size: set BENCH_BATCH=<n> "
            "(not a BENCH_BATCHES list) and run once per size"
        )
    batch = int(batch_env)
    module = AutoencoderKL(config=cfg, dtype=jnp.bfloat16)
    params_host = jax.device_get(module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)), sample_posterior=False,
    )["params"])
    mesh = make_mesh()
    # Device-resident batch, same methodology as bench.py: the tunneled H2D
    # path costs hundreds of ms per 12.6 MB transfer and would otherwise
    # dominate the variant deltas this bench exists to measure.
    data = jax.device_put(
        np.random.default_rng(0)
        .uniform(-1, 1, (batch, resolution, resolution, 3))
        .astype(np.float32)
    )
    mask = jnp.ones(batch, jnp.float32)
    rng = jax.random.PRNGKey(2)

    for label, so, se, sp, ema in CASES:
        tx, _ = build_optimizer(1e-5, warmup_steps=10, max_train_steps=10_000)
        state = TrainState.create(
            jax.device_put(params_host), tx, stats_acc={}, ema=ema > 0,
        )
        if so or se or sp:
            sharding = state_shardings(
                mesh, state, shard_optimizer=so, shard_ema=se,
                shard_params=sp,
            )
        else:
            sharding = replicated_sharding(mesh)
        state = jax.device_put(state, sharding)
        step = make_train_step(
            module, tx, 1e-6, mesh=mesh, ema_decay=ema,
            state_sharding=sharding if (so or se or sp) else None,
        )
        dt, _ = bench.time_steps(
            step, state, {"pixel_values": data}, mask, rng,
            warmup=3, iters=10,
        )
        print(json.dumps({
            "case": "zero_train", "config": label, "resolution": resolution,
            "batch": batch, "ms_per_step": round(dt * 1e3, 1),
            "images_per_sec": round(batch / dt, 1),
        }), flush=True)
        state = step = None
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
