"""2-D (data x spatial) mesh: numerics parity with the unsharded step."""

import jax
import numpy as np
import pytest

from vae_channel_dynamics_tpu.parallel import make_mesh
from vae_channel_dynamics_tpu.parallel.mesh import (
    SPATIAL_AXIS,
    batch_sharding,
    data_axis_size,
)


def test_mesh_shapes():
    mesh = make_mesh(8, spatial=2)
    assert dict(mesh.shape) == {"data": 4, "spatial": 2}
    assert data_axis_size(mesh) == 4
    assert SPATIAL_AXIS in mesh.axis_names
    spec = batch_sharding(mesh).spec
    assert tuple(spec) == ("data", "spatial")
    with pytest.raises(ValueError):
        make_mesh(6, spatial=4)


def test_spatial_step_matches_data_parallel():
    """(4 data x 2 spatial) step must reproduce the 1-D 8-way result: the
    model's convs/norms tolerate H sharding (GSPMD halo exchange + partial
    reductions) without numeric drift beyond fp32 reassociation."""
    import jax.numpy as jnp

    from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
    from vae_channel_dynamics_tpu.training import (
        TrainState,
        build_optimizer,
        make_train_step,
    )

    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        sample_posterior=False,
    )["params"]
    batch = {
        "pixel_values": np.random.default_rng(0)
        .uniform(-1, 1, (8, 16, 16, 3))
        .astype(np.float32)
    }
    mask = np.ones(8, np.float32)
    rng = jax.random.PRNGKey(5)

    results = {}
    for name, mesh in (
        ("dp8", make_mesh(8)),
        ("dp4sp2", make_mesh(8, spatial=2)),
    ):
        tx, _ = build_optimizer(1e-3, 0, 100)
        state = TrainState.create(params, tx)
        from vae_channel_dynamics_tpu.parallel.mesh import replicated_sharding

        state = jax.device_put(state, replicated_sharding(mesh))
        step = make_train_step(module, tx, 1e-6, mesh=mesh, donate=False)
        for _ in range(2):
            state, metrics, _ = step(state, batch, mask, rng)
        results[name] = (
            float(metrics["train_loss_step"]),
            np.asarray(jax.tree.leaves(state.params)[0]),
        )

    np.testing.assert_allclose(results["dp8"][0], results["dp4sp2"][0], rtol=2e-4)
    np.testing.assert_allclose(
        results["dp8"][1], results["dp4sp2"][1], rtol=1e-4, atol=1e-6
    )


@pytest.mark.slow
def test_trainer_with_spatial_config(tmp_path):
    """Trainer end-to-end on a (4 data x 2 spatial) mesh via parallel.spatial."""
    from vae_channel_dynamics_tpu.training.loop import Trainer

    config = {
        "run_name": "sp2",
        "output_dir": str(tmp_path),
        "seed": 0,
        "model": {"pretrained_vae_name": None, "architecture": "tiny"},
        "parallel": {"spatial": 2},
        "data": {
            "dataset_name": "synthetic://shapes",
            "resolution": 16,
            "max_samples": 16,
            "batch_size": 2,  # per data shard -> global 8
            "do_validation": False,
        },
        "training": {
            "num_train_epochs": 1,
            "learning_rate": 1e-4,
            "lr_warmup_steps": 1,
            "mixed_precision": "no",
        },
        "logging": {"log_interval": 1, "report_to": "jsonl"},
        "saving": {"save_interval_steps": 1000},
    }
    summary = Trainer(config).train()
    assert summary["global_step"] >= 2
    assert (
        tmp_path
        / "sp2"
        / "final_model"
        / "vae"
        / "diffusion_pytorch_model.safetensors"
    ).exists()


@pytest.mark.slow
def test_chunked_attention_under_spatial_mesh():
    """The recommended 1024px multi-chip configuration — spatial (H)
    sharding + chunked (online-softmax) mid-block attention — must compose.

    At 80px the tiny config's mid block attends over 40x40 = 1600 tokens
    = 2 scan chunks (the smallest multi-chunk size — 128px/4 chunks was
    measured once in PERF.md but its compile is heavy enough to abort the
    full-suite process under cumulative memory pressure), so this
    exercises the multi-chunk lax.scan under GSPMD. Pinned here: the loss
    matches the naive-attention data-parallel oracle exactly; the compiled
    program still halo-exchanges the convs (collective-permute present —
    H stays sharded through the attention, nothing falls back to
    replication); and the global attention costs a handful of all-gathers,
    NOT one per scan chunk (PERF.md census: +12 all-gathers vs naive under
    the same mesh, out of 447 collective-permutes / 417 all-reduces — at
    1024px the gathered K/V is ~16 MB/image against ~27 ms/image of
    compute)."""
    import re

    import jax.numpy as jnp

    from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
    from vae_channel_dynamics_tpu.parallel.mesh import replicated_sharding
    from vae_channel_dynamics_tpu.training import (
        TrainState,
        build_optimizer,
        make_train_step,
    )

    cfg = VAEConfig.tiny()
    res = 80
    batch = {
        "pixel_values": np.random.default_rng(0)
        .uniform(-1, 1, (8, res, res, 3))
        .astype(np.float32)
    }
    mask = np.ones(8, np.float32)
    rng = jax.random.PRNGKey(5)

    def run(impl, mesh, want_hlo=False):
        module = AutoencoderKL(config=cfg, attn_impl=impl)
        params = module.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, res, res, 3)),
            sample_posterior=False,
        )["params"]
        tx, _ = build_optimizer(1e-3, 0, 100)
        state = jax.device_put(
            TrainState.create(params, tx), replicated_sharding(mesh)
        )
        step = make_train_step(module, tx, 1e-6, mesh=mesh, donate=False)
        hlo = None
        if want_hlo:
            hlo = (
                jax.jit(lambda s, b, m, r: step(s, b, m, r))
                .lower(state, batch, mask, rng)
                .compile()
                .as_text()
            )
        _, metrics, _ = step(state, batch, mask, rng)
        return float(metrics["train_loss_step"]), hlo

    oracle, _ = run("naive", make_mesh(8))
    sp_mesh = make_mesh(8, spatial=2)
    loss, hlo = run("chunked", sp_mesh, want_hlo=True)
    np.testing.assert_allclose(loss, oracle, rtol=2e-4)

    n_permute = len(re.findall(r"\bcollective-permute\b", hlo))
    n_gather = len(re.findall(r"\ball-gather\b", hlo))
    assert n_permute > 100, f"convs no longer halo-exchanged ({n_permute})"
    assert n_gather < 50, (
        f"attention all-gathers exploded ({n_gather}) — the scan is "
        "gathering per chunk instead of once"
    )
