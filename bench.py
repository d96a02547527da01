"""Throughput benchmark: SDXL-VAE fine-tune images/sec/chip @256px.

Runs the real jitted train step (full SDXL-VAE architecture, AdamW, grad
clip, bf16 compute / fp32 params) on device-resident synthetic batches, so
the number measures device compute, not host IO. Also measures the
per-channel tracking overhead (capture taps on vs. off).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip",
   "vs_baseline": N, ...extras}
Baseline target: 3000 images/sec/chip on TPU v5e (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vae_channel_dynamics_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402
from vae_channel_dynamics_tpu.tracking import ActivityMonitor  # noqa: E402
from vae_channel_dynamics_tpu.training import (  # noqa: E402
    TrainState,
    build_optimizer,
    make_train_step,
)

BASELINE_IMAGES_PER_SEC = 3000.0


def _tracking_config():
    return {
        "enabled": True,
        "track_interval": 100,
        "target_layers": [
            {
                "name": "vae.encoder.down_blocks.0.resnets.0.norm1",
                "capture_point": "output",
                "metrics": ["mean_abs_activation_per_channel"],
            },
            {
                "name": "vae.encoder.down_blocks.0.resnets.1.norm1",
                "capture_point": "output",
                "metrics": ["mean_abs_activation_per_channel"],
            },
            {
                "name": "vae.decoder.up_blocks.1.resnets.0.norm1",
                "capture_point": "output",
                "metrics": ["mean_abs_activation_per_channel"],
            },
            {
                "name": "vae.decoder.up_blocks.2.resnets.0.norm1",
                "capture_point": "output",
                "metrics": ["mean_abs_activation_per_channel"],
            },
        ],
    }


def build_step(cfg, batch, resolution, capture_table, params, remat):
    module = AutoencoderKL(
        config=cfg, dtype=jnp.bfloat16, capture=capture_table, remat=remat
    )
    tx, _ = build_optimizer(1e-5, warmup_steps=10, max_train_steps=10_000)
    if capture_table:
        monitor_acc = ActivityMonitor(_tracking_config()).init_acc(
            module, params, (batch, resolution, resolution, 3)
        )
    else:
        monitor_acc = {}
    state = TrainState.create(params, tx, stats_acc=monitor_acc)
    step = make_train_step(
        module, tx, 1e-6, stats_accumulate=ActivityMonitor.accumulate
    )
    return step, state


def time_steps(step, state, batch_np, mask, rng, warmup=3, iters=10):
    """Time via chain-length differencing: run N1 and N2 chained steps each
    ended by a scalar fetch, and divide the time difference by the step-count
    difference. This cancels the constant dispatch/fetch latency, which on
    tunneled-TPU setups dwarfs the step time and makes naive
    ``block_until_ready`` timing meaningless."""

    def run_chain(s, n):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            s, m, _ = step(s, batch_np, mask, rng)
        loss = float(jax.device_get(m["train_loss_step"]))
        return time.perf_counter() - t0, s, loss

    _, state, _ = run_chain(state, warmup)  # compile + warm
    t1, state, _ = run_chain(state, 2)
    t2, state, loss = run_chain(state, 2 + iters)
    assert np.isfinite(loss), f"non-finite loss {loss}"
    return (t2 - t1) / iters, state


def build_forward(cfg, params):
    """Serving path: deterministic encode->decode (no grad, no optimizer)."""
    module = AutoencoderKL(config=cfg, dtype=jnp.bfloat16)

    @jax.jit
    def fwd(params, pixels):
        out = module.apply({"params": params}, pixels, sample_posterior=False)
        return out["reconstruction"]

    return fwd


def time_forward(fwd, params, data, warmup=3, iters=10):
    def run_chain(n):
        t0 = time.perf_counter()
        x = data
        for _ in range(n):
            x = fwd(params, x)
        _ = float(jax.device_get(jnp.sum(x.astype(jnp.float32))))
        return time.perf_counter() - t0

    run_chain(warmup)
    t1 = run_chain(2)
    t2 = run_chain(2 + iters)
    return (t2 - t1) / iters


def main() -> int:
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    resolution = int(os.environ.get("BENCH_RESOLUTION", "256" if on_tpu else "32"))
    cfg = VAEConfig.sdxl() if on_tpu else VAEConfig.tiny()
    candidate_batches = (
        [int(b) for b in os.environ.get("BENCH_BATCHES", "").split(",") if b]
        or ([24] if on_tpu else [8])  # 24 measured best on v5e @256px
    )
    # Measured on v5e: activations fit HBM without remat up to batch 16 at
    # 256px, and skipping the recompute is worth ~14% (51.6 vs 45.3 img/s).
    remat = os.environ.get("BENCH_REMAT", "0") == "1" and on_tpu

    module0 = AutoencoderKL(config=cfg, dtype=jnp.bfloat16)
    sample = jnp.zeros((1, 64 if on_tpu else 32, 64 if on_tpu else 32, 3))
    params_host = jax.device_get(
        module0.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            sample,
            sample_posterior=False,
        )["params"]
    )

    rng = jax.random.PRNGKey(2)
    best = None
    for batch in candidate_batches:
        try:
            data = jax.device_put(
                np.random.default_rng(0)
                .uniform(-1, 1, (batch, resolution, resolution, 3))
                .astype(np.float32)
            )
            mask = jnp.ones(batch, jnp.float32)
            params = jax.device_put(params_host)  # fresh buffers (steps donate)
            step, state = build_step(cfg, batch, resolution, (), params, remat)
            dt, _ = time_steps(step, state, {"pixel_values": data}, mask, rng)
            ips = batch / dt
            print(
                f"# batch={batch}: {dt*1e3:.1f} ms/step, {ips:.1f} img/s",
                file=sys.stderr,
            )
            if best is None or ips > best["ips"]:
                best = {"batch": batch, "ips": ips, "dt": dt}
        except Exception as e:  # noqa: BLE001 — OOM at large batch: try smaller
            print(f"# batch={batch} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue

    if best is None and 8 not in candidate_batches:
        # OOM fallback: retry once at a conservative batch size
        for batch in (8,):
            try:
                data = jax.device_put(
                    np.random.default_rng(0)
                    .uniform(-1, 1, (batch, resolution, resolution, 3))
                    .astype(np.float32)
                )
                mask = jnp.ones(batch, jnp.float32)
                params = jax.device_put(params_host)
                step, state = build_step(cfg, batch, resolution, (), params, remat)
                dt, _ = time_steps(step, state, {"pixel_values": data}, mask, rng)
                best = {"batch": batch, "ips": batch / dt, "dt": dt}
            except Exception as e:  # noqa: BLE001
                print(f"# fallback batch={batch} failed: {e}", file=sys.stderr)

    if best is None:
        print(json.dumps({"metric": "error", "value": 0, "unit": "",
                          "vs_baseline": 0}))
        return 1

    # tracking overhead at the best batch size
    overhead_pct = None
    try:
        batch = best["batch"]
        data = jax.device_put(
            np.random.default_rng(0)
            .uniform(-1, 1, (batch, resolution, resolution, 3))
            .astype(np.float32)
        )
        mask = jnp.ones(batch, jnp.float32)
        monitor = ActivityMonitor(_tracking_config())
        params = jax.device_put(params_host)
        step_t, state_t = build_step(
            cfg, batch, resolution, monitor.scalar_capture_table, params, remat
        )
        dt_tracked, _ = time_steps(step_t, state_t, {"pixel_values": data}, mask, rng)
        overhead_pct = (dt_tracked - best["dt"]) / best["dt"] * 100.0
        print(
            f"# tracking overhead: {overhead_pct:.2f}% "
            f"({dt_tracked*1e3:.1f} vs {best['dt']*1e3:.1f} ms)",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"# tracking overhead measurement failed: {e}", file=sys.stderr)

    # serving (forward-only) throughput at the best batch size
    forward_ips = None
    try:
        batch = best["batch"]
        data = jax.device_put(
            np.random.default_rng(0)
            .uniform(-1, 1, (batch, resolution, resolution, 3))
            .astype(np.float32)
        )
        params = jax.device_put(params_host)
        fwd = build_forward(cfg, params)
        dt_fwd = time_forward(fwd, params, data)
        forward_ips = batch / dt_fwd
        print(
            f"# forward-only: {dt_fwd*1e3:.1f} ms/batch, {forward_ips:.1f} img/s",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"# forward benchmark failed: {e}", file=sys.stderr)

    result = {
        "metric": f"sdxl_vae_train_images_per_sec_per_chip@{resolution}px",
        "value": round(best["ips"], 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(best["ips"] / BASELINE_IMAGES_PER_SEC, 4),
        "batch": best["batch"],
        "step_ms": round(best["dt"] * 1e3, 2),
        "platform": platform,
        "tracking_overhead_pct": (
            round(overhead_pct, 2) if overhead_pct is not None else None
        ),
        "forward_images_per_sec": (
            round(forward_ips, 2) if forward_ips is not None else None
        ),
        # 2.66 TFLOP/image @256px from XLA cost analysis (PERF.md), scaled
        # quadratically with resolution (conv-dominated); v5e bf16 peak 197
        "mfu_pct": round(
            best["ips"] * 2.66e12 * (resolution / 256.0) ** 2 / 197e12 * 100.0,
            1,
        )
        if on_tpu
        else None,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
