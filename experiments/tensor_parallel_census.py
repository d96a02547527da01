"""Structural evidence for tensor parallelism: compiled-HLO collective
census of the full train step under a data x tensor mesh vs the plain
data mesh (the same methodology as the spatial-sharding census in
PERF.md "Multi-chip scaling"; timing on the virtual CPU mesh is
dispatch-bound and meaningless, structure is the transferable signal).

The reference has no model-parallel axis (SURVEY.md §2b); this pins what
GSPMD actually compiles when parallel.tensor shards the channel axes:
how many all-gathers / reduce-scatters / all-reduces / collective-permutes
the conv chain pays per step, and that the losses stay identical to the
replicated oracle.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python experiments/tensor_parallel_census.py
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
# append rather than setdefault: a pre-existing XLA_FLAGS (dump/cache
# flags) must not silently drop the 8-virtual-device flag
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from vae_channel_dynamics_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402
from vae_channel_dynamics_tpu.parallel import make_mesh  # noqa: E402
from vae_channel_dynamics_tpu.parallel.mesh import replicated_sharding  # noqa: E402
from vae_channel_dynamics_tpu.parallel.zero import state_shardings  # noqa: E402
from vae_channel_dynamics_tpu.training import (  # noqa: E402
    TrainState,
    build_optimizer,
    make_train_step,
)

COLLECTIVES = (
    "all-gather",
    "all-reduce",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)


_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
    "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
}


def census(compiled) -> dict:
    """Per-op collective counts plus total result bytes per step.

    Bytes are parsed from each collective's HLO result type (the shape
    printed before the op name, e.g. ``f32[4,3,3,512]{...} all-gather(``);
    tuple-result collectives contribute every element. Counts alone
    undersell TP's cost at real channel widths — a 3x3x512x512 kernel
    all-gather moves 9.4 MB while a tiny-config one moves 36 KB."""
    hlo = compiled.as_text()
    counts = collections.Counter()
    bytes_by_op = collections.Counter()
    shape_re = re.compile(r"(\w+)\[([0-9,]*)\]")
    # Big tuple types embed /*index=N*/ comments (an '=' mid-type), so the
    # result type must be extracted AFTER stripping comments, per line —
    # a naive [^=]*? lookback silently skips exactly the largest
    # (gradient-bundle) collectives.
    for raw in hlo.splitlines():
        line = re.sub(r"/\*.*?\*/", "", raw)
        for op in COLLECTIVES:
            m = re.search(rf"= (.*?)\s{op}(?:-start)?\(", line)
            if not m:
                continue
            counts[op] += 1
            for dtype, dims in shape_re.findall(m.group(1)):
                if dtype not in _DTYPE_BYTES:
                    continue
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                bytes_by_op[op] += n * _DTYPE_BYTES[dtype]
            break  # one defining op per line
    out = {op: counts[op] for op in COLLECTIVES}
    out["total_bytes_mb"] = round(sum(bytes_by_op.values()) / 2**20, 2)
    out["bytes_mb_by_op"] = {
        op: round(v / 2**20, 2) for op, v in bytes_by_op.items() if v
    }
    return out


def main():
    # CENSUS_ARCH=sdxl runs the census at the real model's channel widths
    # (128/256/512/512 encoder, 512-ch mid + decoder resnets) at a small
    # spatial shape — the collective COUNT is shape-independent (one per
    # annotated conv/param site) but the per-collective BYTES scale with
    # channel width, which is what the SCALING.md cost table needs
    # quantified on the real model (VERDICT r4 missing #3).
    arch = os.environ.get("CENSUS_ARCH", "tiny")
    res = int(os.environ.get("CENSUS_RES", "32"))
    cfg = VAEConfig.sdxl() if arch == "sdxl" else VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)),
        sample_posterior=False,
    )["params"]
    rng = np.random.default_rng(0)
    # one batch for every variant — the loss-equality check below is only
    # meaningful when all three layouts see identical data
    batch_n = 8
    batch = {
        "pixel_values": rng.uniform(-1, 1, (batch_n, res, res, 3)).astype(
            np.float32
        )
    }
    mask = np.ones(batch_n, np.float32)
    results = {}
    losses = {}
    for tag, mesh_kwargs, sharded in (
        ("dp4", dict(n_devices=4), False),
        ("dp4xtp2", dict(n_devices=8, tensor=2), True),
        ("dp4xtp2+zero1", dict(n_devices=8, tensor=2), "zero"),
    ):
        mesh = make_mesh(**mesh_kwargs)
        tx, _ = build_optimizer(1e-4, warmup_steps=1, max_train_steps=10)
        state = TrainState.create(params, tx, stats_acc={})
        sharding = (
            state_shardings(
                mesh, state, shard_optimizer=(sharded == "zero")
            )
            if sharded
            else None
        )
        state = jax.device_put(
            state, sharding if sharding is not None else replicated_sharding(mesh)
        )
        step = make_train_step(
            module, tx, 1e-6, mesh=mesh, donate=False, state_sharding=sharding
        )
        lowered = step.lower(state, batch, mask, jax.random.PRNGKey(1))
        compiled = lowered.compile()
        results[tag] = census(compiled)
        _, metrics, _ = step(state, batch, mask, jax.random.PRNGKey(1))
        losses[tag] = float(metrics["train_loss_step"])
        print(f"{tag}: {results[tag]}  loss={losses[tag]:.6f}", flush=True)

    assert abs(losses["dp4"] - losses["dp4xtp2"]) <= 1e-5 * max(
        1.0, abs(losses["dp4"])
    ), losses
    print("losses identical across dp4 / dp4xtp2:", losses)


if __name__ == "__main__":
    main()
