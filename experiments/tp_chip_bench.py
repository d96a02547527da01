"""TP-annotated train step on the real chip: compile + run degenerate.

The multi-device distribution/parity behavior of tensor (channel)
parallelism is pinned on the 8-virtual-device CPU mesh
(tests/test_tensor_parallel.py); what that cannot prove is that the
TP-annotated program COMPILES AND RUNS on the actual TPU toolchain — the
zero_bench methodology (experiments/zero_bench.py): on a single chip the
shardings are degenerate (1 shard per leaf) but the sharding-constraint
code paths and the schedule XLA compiles from the annotations still
execute, so the replicated-vs-annotated ms/step delta quantifies the
overhead of the annotations themselves.

make_mesh drops trivial axes, so the degenerate tensor axis is built
explicitly here (a 1x1 data x tensor mesh) and every param/moment/EMA
leaf is forcibly annotated with its TP channel-axis spec (the same
``_channel_axis`` contract ``parallel/zero.py::_combined_spec`` applies
when tensor > 1 — which it skips at size 1, hence the force).

Reference anchor: the reference has no model-parallel axis at all
(SURVEY.md §2b, accelerate DDP only). Run via nohup + polling.
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

import bench  # noqa: E402
from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402
from vae_channel_dynamics_tpu.parallel.mesh import (  # noqa: E402
    DATA_AXIS,
    TENSOR_AXIS,
    replicated_sharding,
)
from vae_channel_dynamics_tpu.parallel.zero import _channel_axis  # noqa: E402
from vae_channel_dynamics_tpu.training import (  # noqa: E402
    TrainState,
    build_optimizer,
    make_train_step,
)


def forced_tp_shardings(mesh: Mesh, state) -> "TrainState":
    """The spec _combined_spec would emit for tensor>1, at tensor size 1."""

    def leaf(x):
        i = _channel_axis(x.shape, 1)  # size 1 divides every dim -> last axis
        if i is None:  # scalars (Adam count, step)
            return NamedSharding(mesh, P())
        spec = [None] * x.ndim
        spec[i] = TENSOR_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(leaf, state)


def main():
    res = int(os.environ.get("BENCH_RESOLUTION", "256"))
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    cfg = VAEConfig.sdxl()
    module = AutoencoderKL(config=cfg, dtype=jnp.bfloat16)
    params_host = jax.device_get(module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)), sample_posterior=False,
    )["params"])
    mesh = Mesh(
        np.asarray(jax.devices()[:1]).reshape(1, 1), (DATA_AXIS, TENSOR_AXIS)
    )
    data = jax.device_put(
        np.random.default_rng(0)
        .uniform(-1, 1, (batch, res, res, 3))
        .astype(np.float32)
    )
    mask = jnp.ones(batch, jnp.float32)
    rng = jax.random.PRNGKey(2)

    for label in ("replicated", "tp_annotated"):
        tx, _ = build_optimizer(1e-5, warmup_steps=10, max_train_steps=10_000)
        state = TrainState.create(
            jax.device_put(params_host), tx, stats_acc={}
        )
        if label == "tp_annotated":
            sharding = forced_tp_shardings(mesh, state)
        else:
            sharding = replicated_sharding(mesh)
        state = jax.device_put(state, sharding)
        step = make_train_step(
            module, tx, 1e-6, mesh=mesh,
            state_sharding=sharding if label == "tp_annotated" else None,
        )
        dt, out_state = bench.time_steps(
            step, state, {"pixel_values": data}, mask, rng,
            warmup=3, iters=10,
        )
        print(json.dumps({
            "case": "tp_chip", "config": label, "resolution": res,
            "batch": batch, "ms_per_step": round(dt * 1e3, 1),
            "images_per_sec": round(batch / dt, 1),
        }), flush=True)
        state = step = out_state = None
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
