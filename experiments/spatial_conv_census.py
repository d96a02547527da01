"""Compiled-HLO collective census: GSPMD vs shard_map spatial convs.

Quantifies what `parallel.spatial_conv: shard_map` (ops/spatial_conv.py
— manual ppermute halo exchange per conv) actually compiles to, next to
the default GSPMD halo partitioner, on the same meshes (the structural
methodology of tensor_parallel_census.py; virtual-CPU timing is
dispatch-bound and meaningless, collective structure is the transferable
signal). Variants:

  spatial-gspmd        data x spatial (2x4), replicated params, GSPMD halos
  spatial-shard_map    same mesh/layout, manual halos
  zero3-gspmd          + ZeRO-3 params — the compute-time re-replication
                       workaround path (training/step.py)
  zero3-shard_map      + ZeRO-3 params — distributed at compute, no
                       workaround
  spxtp-shard_map      data x spatial x tensor (2x2x2) — the mesh GSPMD
                       cannot compile correctly at all

Losses are asserted identical to the data-parallel oracle for every
variant (the correctness half; trajectory-level parity is pinned in
tests/test_spatial_conv.py).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python experiments/spatial_conv_census.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
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

from tensor_parallel_census import census  # noqa: E402
from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402
from vae_channel_dynamics_tpu.parallel import make_mesh  # noqa: E402
from vae_channel_dynamics_tpu.parallel.mesh import replicated_sharding  # noqa: E402
from vae_channel_dynamics_tpu.parallel.zero import state_shardings  # noqa: E402
from vae_channel_dynamics_tpu.training import (  # noqa: E402
    TrainState,
    build_optimizer,
    make_train_step,
)


def main():
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
    batch_n = 8
    batch = {
        "pixel_values": rng.uniform(-1, 1, (batch_n, res, res, 3)).astype(
            np.float32
        )
    }
    mask = np.ones(batch_n, np.float32)
    results, losses = {}, {}
    # CENSUS_SPATIAL: spatial degree for the head-to-head rows (default 4;
    # the SDXL-width shard_map compile at spatial=4 exceeds this box's CPU
    # RSS ceiling — use 2 there)
    sp = int(os.environ.get("CENSUS_SPATIAL", "4"))
    variants = (
        ("dp-oracle", dict(n_devices=4), "gspmd", False),
        ("spatial-gspmd", dict(n_devices=8, spatial=sp), "gspmd", False),
        ("spatial-shard_map", dict(n_devices=8, spatial=sp), "shard_map", False),
        ("zero3-gspmd", dict(n_devices=8, spatial=sp), "gspmd", True),
        ("zero3-shard_map", dict(n_devices=8, spatial=sp), "shard_map", True),
        (
            "spxtp-shard_map",
            dict(n_devices=8, spatial=2, tensor=2, spatial_conv="shard_map"),
            "shard_map",
            False,
        ),
    )
    # CENSUS_VARIANTS: comma-separated tags to run — one variant per
    # process keeps the SDXL-width compiles under the box's RSS ceiling
    # (CLAUDE.md: cumulative heavy XLA CPU compiles SIGABRT the process);
    # loss-parity asserts only run when the dp oracle is in the selection.
    only = os.environ.get("CENSUS_VARIANTS")
    if only:
        wanted = {t.strip() for t in only.split(",")}
        variants = tuple(v for v in variants if v[0] in wanted)
    for tag, mesh_kwargs, conv_impl, zero3 in variants:
        mesh = make_mesh(**mesh_kwargs)
        tx, _ = build_optimizer(1e-4, warmup_steps=1, max_train_steps=10)
        state = TrainState.create(params, tx, stats_acc={})
        sharding = (
            state_shardings(
                mesh, state, shard_optimizer=zero3, shard_params=zero3
            )
            if (zero3 or "tensor" in mesh.axis_names)
            else None
        )
        state = jax.device_put(
            state,
            sharding if sharding is not None else replicated_sharding(mesh),
        )
        step = make_train_step(
            module, tx, 1e-6, mesh=mesh, donate=False,
            state_sharding=sharding, spatial_conv=conv_impl,
        )
        compiled = step.lower(state, batch, mask, jax.random.PRNGKey(1)).compile()
        results[tag] = census(compiled)
        _, metrics, _ = step(state, batch, mask, jax.random.PRNGKey(1))
        losses[tag] = float(metrics["train_loss_step"])
        print(f"{tag}: {results[tag]}  loss={losses[tag]:.6f}", flush=True)

    if "dp-oracle" in losses:
        ref = losses["dp-oracle"]
        for tag, loss in losses.items():
            assert abs(loss - ref) <= 1e-5 * max(1.0, abs(ref)), (tag, losses)
        print("losses identical across all variants:", losses)


if __name__ == "__main__":
    main()
