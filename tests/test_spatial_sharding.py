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
