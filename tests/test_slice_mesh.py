"""Multi-slice (DCN) mesh: structure, shardings, and train-step parity.

``parallel.slices`` models a multi-slice pod — several ICI-connected slices
joined by DCN. The slice axis is outermost so the batch shards over
``(slice, data)`` jointly and XLA's gradient reduction decomposes
hierarchically (ICI within a slice, DCN once per slice). On the virtual
8-device CPU mesh there is no physical DCN, so what these tests pin down is
the program: mesh layout, sharding specs, and exact numerical equivalence
with the 1-D data-parallel step (the same DDP-equivalence guarantee as
tests/test_train_step.py::test_mesh_parity_with_single_device)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
from vae_channel_dynamics_tpu.parallel import make_mesh
from vae_channel_dynamics_tpu.parallel.mesh import (
    DATA_AXIS,
    SLICE_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    data_axis_size,
    vector_sharding,
)
from vae_channel_dynamics_tpu.training import (
    TrainState,
    build_optimizer,
    make_train_step,
)


def _setup(mesh):
    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(1e-3, warmup_steps=2, max_train_steps=100)
    state = TrainState.create(params, tx)
    step = make_train_step(module, tx, 1e-6, mesh=mesh, donate=False)
    return state, step


def _batch(n=8, r=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "pixel_values": rng.uniform(-1, 1, (n, r, r, 3)).astype(np.float32)
    }, np.ones(n, np.float32)


def test_mesh_structure_and_sharding_specs():
    mesh = make_mesh(8, slices=2)
    assert mesh.axis_names == (SLICE_AXIS, DATA_AXIS)
    assert dict(mesh.shape) == {SLICE_AXIS: 2, DATA_AXIS: 4}
    assert data_axis_size(mesh) == 8  # batch shards over slice x data
    assert batch_sharding(mesh).spec == jax.sharding.PartitionSpec(
        (SLICE_AXIS, DATA_AXIS)
    )
    assert vector_sharding(mesh).spec == jax.sharding.PartitionSpec(
        (SLICE_AXIS, DATA_AXIS)
    )

    mesh3 = make_mesh(8, slices=2, spatial=2)
    assert mesh3.axis_names == (SLICE_AXIS, DATA_AXIS, SPATIAL_AXIS)
    assert dict(mesh3.shape) == {SLICE_AXIS: 2, DATA_AXIS: 2, SPATIAL_AXIS: 2}
    assert batch_sharding(mesh3).spec == jax.sharding.PartitionSpec(
        (SLICE_AXIS, DATA_AXIS), SPATIAL_AXIS
    )


def test_mesh_validation():
    with pytest.raises(ValueError, match="divisible"):
        make_mesh(8, slices=3)
    with pytest.raises(ValueError, match="divisible"):
        make_mesh(8, slices=2, spatial=8)


def test_slice_mesh_train_parity_with_data_mesh():
    """(2 slices x 4) must produce the exact numbers of the 8-way data mesh
    and stay replicated across every device."""
    state_d, step_d = _setup(make_mesh(8))
    state_s, step_s = _setup(make_mesh(8, slices=2))
    batch, mask = _batch(8, seed=3)
    rng = jax.random.PRNGKey(7)
    for _ in range(2):
        state_d, met_d, _ = step_d(state_d, batch, mask, rng)
        state_s, met_s, _ = step_s(state_s, batch, mask, rng)
    np.testing.assert_allclose(
        float(met_d["train_loss_step"]), float(met_s["train_loss_step"]),
        rtol=2e-4,
    )
    leaf_d = jax.tree.leaves(state_d.params)[0]
    leaf_s = jax.tree.leaves(state_s.params)[0]
    np.testing.assert_allclose(
        np.asarray(leaf_d), np.asarray(leaf_s), rtol=1e-4, atol=1e-6
    )


def test_slice_plus_spatial_train_parity():
    """The full 3-D (slice, data, spatial) mesh — batch over slice x data,
    image rows over spatial — matches the unsharded numbers too."""
    state_s, step_s = _setup(make_mesh(8, slices=2, spatial=2))
    state_r, step_r = _setup(None)
    batch, mask = _batch(4, seed=5)
    rng = jax.random.PRNGKey(11)
    state_s, met_s, _ = step_s(state_s, batch, mask, rng)
    state_r, met_r, _ = step_r(state_r, batch, mask, rng)
    np.testing.assert_allclose(
        float(met_s["train_loss_step"]), float(met_r["train_loss_step"]),
        rtol=2e-4,
    )


def test_trainer_accepts_slices_config(tmp_path):
    """parallel.slices threads from YAML into the Trainer's mesh."""
    from vae_channel_dynamics_tpu.training.loop import Trainer

    config = {
        "run_name": "slice_smoke",
        "output_dir": str(tmp_path),
        "seed": 0,
        "model": {"architecture": "tiny", "pretrained_vae_name": None},
        "data": {
            "dataset_name": "synthetic://noise",
            "resolution": 16,
            "max_samples": 16,
            "batch_size": 2,
            "num_workers": 0,
            "do_validation": False,
        },
        "training": {
            "num_train_epochs": 1,
            "learning_rate": 1e-4,
            "mixed_precision": "no",
            "kl_weight": 1e-6,
            "max_grad_norm": 1.0,
        },
        "logging": {"log_interval": 1, "report_to": "jsonl"},
        "saving": {"save_interval_steps": 1000},
        "tracking": {"enabled": False},
        "dead_neuron_tracking": {"enabled": False},
        "logit_lens": {"enabled": False},
        "classification": {"enabled": False},
        "intervention": {"enabled": False},
        "parallel": {"slices": 2},
    }
    summary = Trainer(config).train()
    assert summary["global_step"] >= 1


def test_slice_device_grouping_validation():
    """Grouping by slice_index must refuse layouts it cannot align with the
    DCN boundary: uneven devices per slice (reshape would mix physical
    slices within a mesh row — ICI-sized traffic over DCN, silently) and
    partially-tagged device sets. Even groups sort by (slice_index, id)."""
    from types import SimpleNamespace as Dev

    from vae_channel_dynamics_tpu.parallel.mesh import (
        _order_devices_for_slices,
    )

    def dev(slice_index, id):
        return Dev(slice_index=slice_index, id=id)

    # even groups: ordered slice-major, id within
    devs = [dev(1, 3), dev(0, 2), dev(1, 1), dev(0, 0)]
    ordered = _order_devices_for_slices(devs, 2)
    assert [(d.slice_index, d.id) for d in ordered] == [
        (0, 0), (0, 2), (1, 1), (1, 3),
    ]

    # untagged (virtual mesh): contiguous grouping, order preserved
    untagged = [Dev(id=i) for i in range(4)]
    assert _order_devices_for_slices(untagged, 2) == untagged

    # uneven devices per slice: loud error, not a silent misgrouping
    uneven = [dev(0, 0), dev(0, 1), dev(0, 2), dev(1, 3)]
    with pytest.raises(ValueError, match="uneven devices per slice"):
        _order_devices_for_slices(uneven, 2)

    # mixed tagged/untagged: loud error, not a TypeError from sorted()
    mixed = [dev(0, 0), dev(None, 1), dev(1, 2), dev(1, 3)]
    with pytest.raises(ValueError, match="only some devices"):
        _order_devices_for_slices(mixed, 2)

    # tag count disagreeing with parallel.slices
    with pytest.raises(ValueError, match="distinct device slice_index"):
        _order_devices_for_slices(devs, 4)
