"""Tensor (channel) parallelism — ``parallel.tensor``.

The reference has no model-parallel axis at all (SURVEY.md §2b: HF
Accelerate data parallelism only; TP listed as "optional later for 1024px
stretch"). Here TP is pure sharding annotations: parameters shard their
channel axes over an innermost ``tensor`` mesh axis
(parallel/zero.py::_combined_spec) and GSPMD derives the activation
gathers / partial-sum reductions at each conv. These tests pin (a) mesh
construction with the new axis, (b) the per-leaf spec composition with
ZeRO, (c) that the TP train step matches the replicated trajectory while
the params really live 1/tp per device, (d) eval on TP-sharded params,
(e) layout-independent checkpoints, and (f) the YAML key threading through
the Trainer with the nudge path live.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
from vae_channel_dynamics_tpu.parallel import make_mesh
from vae_channel_dynamics_tpu.parallel.mesh import (
    DATA_AXIS,
    TENSOR_AXIS,
    replicated_sharding,
)
from vae_channel_dynamics_tpu.parallel.zero import (
    _combined_spec,
    state_shardings,
)
from vae_channel_dynamics_tpu.training import (
    TrainState,
    build_optimizer,
    make_eval_step,
    make_train_step,
)
from vae_channel_dynamics_tpu.training.checkpoint import (
    restore_train_state,
    save_train_state,
)


def test_make_mesh_tensor_axis():
    mesh = make_mesh(8, tensor=2)
    assert mesh.axis_names == (DATA_AXIS, TENSOR_AXIS)
    assert dict(mesh.shape) == {"data": 4, "tensor": 2}
    # spatial x tensor is REFUSED (round 5): jax 0.9.0 GSPMD miscompiles
    # halo-exchange convs with feature-sharded kernels — see
    # tests/test_spatial_tensor_guard.py for the pinned repro/canary
    with pytest.raises(ValueError, match="spatial"):
        make_mesh(8, spatial=2, tensor=2)
    # existing layouts unchanged (no trivial tensor axis appended)
    assert make_mesh(8).axis_names == (DATA_AXIS,)
    assert make_mesh(8, spatial=2, slices=2).axis_names == (
        "slice", DATA_AXIS, "spatial",
    )
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(8, tensor=3)
    with pytest.raises(ValueError, match=">= 1"):
        make_mesh(8, tensor=0)


def test_combined_spec_composes_tensor_and_data():
    mesh = make_mesh(8, tensor=2)  # data=4, tensor=2
    # conv HWIO: O takes tensor; ZeRO then takes the largest REMAINING
    # axis (I) over data
    assert _combined_spec((3, 3, 16, 32), mesh, False) == P(
        None, None, None, TENSOR_AXIS
    )
    assert _combined_spec((3, 3, 16, 32), mesh, True) == P(
        None, None, DATA_AXIS, TENSOR_AXIS
    )
    # conv_out-style kernels (O=3 indivisible): tensor falls back to I
    assert _combined_spec((3, 3, 16, 3), mesh, False) == P(
        None, None, TENSOR_AXIS, None
    )
    # down-projection convs (I > O, e.g. the decoder's 512→256): the
    # tensor axis is a semantic contract (O = contiguous minor dim), not a
    # balance heuristic — O still takes tensor even though I is larger
    assert _combined_spec((3, 3, 64, 32), mesh, False) == P(
        None, None, None, TENSOR_AXIS
    )
    assert _combined_spec((3, 3, 64, 32), mesh, True) == P(
        None, None, DATA_AXIS, TENSOR_AXIS
    )
    # γ/β/bias vectors: the only axis goes to tensor; data finds no
    # remaining axis and stays unsharded
    assert _combined_spec((32,), mesh, False) == P(TENSOR_AXIS)
    assert _combined_spec((32,), mesh, True) == P(TENSOR_AXIS)
    # scalars replicated
    assert _combined_spec((), mesh, True) == P()
    # no tensor axis in the mesh → pure ZeRO behavior
    mesh_dp = make_mesh(8)
    assert _combined_spec((32,), mesh_dp, True) == P(DATA_AXIS)
    assert _combined_spec((32,), mesh_dp, False) == P()


def _setup(mesh, sharded, shard_optimizer=False, ema_decay=0.0):
    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(1e-3, warmup_steps=2, max_train_steps=100)
    state = TrainState.create(params, tx, ema=ema_decay > 0.0)
    sharding = (
        state_shardings(
            mesh, state, shard_optimizer=shard_optimizer,
            shard_ema=False, shard_params=False,
        )
        if sharded
        else None
    )
    state = jax.device_put(
        state, sharding if sharding is not None else replicated_sharding(mesh)
    )
    step = make_train_step(
        module, tx, 1e-6, mesh=mesh, donate=False, state_sharding=sharding,
        ema_decay=ema_decay,
    )
    return module, state, step


def _batch(n=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "pixel_values": rng.uniform(-1, 1, (n, 16, 16, 3)).astype(np.float32)
    }, np.ones(n, np.float32)


def test_tp_step_matches_replicated_and_distributes_params():
    """Same data-parallel width (4), with and without the 2-way tensor
    axis: identical losses/params up to fp32 reduction-order noise, and
    the TP params really live 1/2 per tensor shard."""
    mesh_r = make_mesh(4)
    mesh_t = make_mesh(8, tensor=2)
    _, state_r, step_r = _setup(mesh_r, sharded=False)
    _, state_t, step_t = _setup(mesh_t, sharded=True)

    sharded = [
        leaf
        for leaf in jax.tree.leaves(state_t.params)
        if not leaf.sharding.is_fully_replicated
    ]
    assert len(sharded) > 100, "expected most param leaves tensor-sharded"
    for leaf in sharded:
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        assert int(np.prod(shard_shape)) * 2 == leaf.size, (
            leaf.shape, shard_shape,
        )

    batch, mask = _batch(8, seed=3)
    rng = jax.random.PRNGKey(7)
    for _ in range(3):
        state_r, met_r, _ = step_r(state_r, batch, mask, rng)
        state_t, met_t, _ = step_t(state_t, batch, mask, rng)
    np.testing.assert_allclose(
        float(met_r["train_loss_step"]), float(met_t["train_loss_step"]),
        rtol=2e-5,
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state_r.params)),
        jax.tree.leaves(jax.device_get(state_t.params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )
    # out_shardings keep the updated params distributed
    for leaf in jax.tree.leaves(state_t.params):
        if any(d % 2 == 0 and d >= 2 for d in leaf.shape):
            assert not leaf.sharding.is_fully_replicated


def test_tp_composes_with_zero1():
    """shard_optimizer on a tensor mesh: moment leaves shard over BOTH
    axes where two divisible dims exist (conv kernels: I over data, O over
    tensor → 1/8 of the leaf per device on the 4x2 mesh), and the step
    still runs to a finite loss."""
    mesh = make_mesh(8, tensor=2)
    _, state, step = _setup(mesh, sharded=True, shard_optimizer=True)
    both = [
        leaf
        for leaf in jax.tree.leaves(state.opt_state)
        if hasattr(leaf, "sharding")
        and hasattr(leaf, "shape")
        and len(leaf.shape) == 4
        and leaf.shape[2] % 4 == 0
        and leaf.shape[2] >= 4
        and leaf.shape[3] % 2 == 0
    ]
    assert both, "expected conv moment leaves shardable on both axes"
    for leaf in both:
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        assert int(np.prod(shard_shape)) * 8 == leaf.size, (
            leaf.shape, shard_shape,
        )
    batch, mask = _batch(8, seed=5)
    state, met, _ = step(state, batch, mask, jax.random.PRNGKey(11))
    assert np.isfinite(float(met["train_loss_step"]))


def test_tp_ema_follows_param_layout():
    """training.ema_decay on a tensor mesh: the EMA copy shards exactly
    like the params (state_shardings tensor-shards it even with
    shard_ema=False — a layout mismatch in the elementwise blend would
    force XLA to gather either side), the step's blend keeps it
    distributed, and the values match the host-computed
    d*ema + (1-d)*params_new blend."""
    mesh = make_mesh(8, tensor=2)
    _, state, step = _setup(mesh, sharded=True, ema_decay=0.9)
    assert state.ema_params is not None
    for p, e in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(state.ema_params)
    ):
        assert p.sharding == e.sharding, (p.shape, p.sharding, e.sharding)
    assert any(
        not e.sharding.is_fully_replicated
        for e in jax.tree.leaves(state.ema_params)
    )
    ema_pre = jax.device_get(state.ema_params)
    batch, mask = _batch(8, seed=21)
    state, met, _ = step(state, batch, mask, jax.random.PRNGKey(3))
    assert np.isfinite(float(met["train_loss_step"]))
    params_post = jax.device_get(state.params)
    for e_new, e_old, p_new in zip(
        jax.tree.leaves(jax.device_get(state.ema_params)),
        jax.tree.leaves(ema_pre),
        jax.tree.leaves(params_post),
    ):
        np.testing.assert_allclose(
            np.asarray(e_new),
            0.9 * np.asarray(e_old) + 0.1 * np.asarray(p_new),
            rtol=1e-5,
            atol=1e-7,
        )
    # the blend's out_shardings keep the updated EMA distributed
    assert any(
        not e.sharding.is_fully_replicated
        for e in jax.tree.leaves(state.ema_params)
    )


def test_tp_eval_step_accepts_sharded_params():
    from vae_channel_dynamics_tpu.parallel.zero import tensor_shardings

    mesh = make_mesh(8, tensor=2)
    module, state, step = _setup(mesh, sharded=True)
    batch, mask = _batch(8, seed=33)
    state, _, _ = step(state, batch, mask, jax.random.PRNGKey(5))

    eval_tp = make_eval_step(
        module, mesh=mesh,
        params_sharding=tensor_shardings(mesh, state.params),
    )
    eval_repl = make_eval_step(module, mesh=mesh)
    batch_dev = {"pixel_values": jnp.asarray(batch["pixel_values"])}
    mask_dev = jnp.asarray(mask)
    out_t = eval_tp(state.params, batch_dev, mask_dev)
    out_r = eval_repl(jax.device_get(state.params), batch_dev, mask_dev)
    np.testing.assert_allclose(
        float(out_t["rec_loss_sum"]), float(out_r["rec_loss_sum"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(out_t["kl_sum"]), float(out_r["kl_sum"]), rtol=1e-5, atol=1e-6
    )


def test_tp_checkpoint_roundtrip(tmp_path):
    """device_get gathers the tensor shards, so checkpoints stay
    layout-independent: save TP-sharded, restore into a fresh host
    template, compare against the live state."""
    mesh = make_mesh(8, tensor=2)
    _, state, step = _setup(mesh, sharded=True)
    batch, mask = _batch(8, seed=9)
    state, _, _ = step(state, batch, mask, jax.random.PRNGKey(0))

    save_train_state(str(tmp_path / "ck"), state)

    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(1e-3, warmup_steps=2, max_train_steps=100)
    template = TrainState.create(params, tx)
    restored = restore_train_state(str(tmp_path / "ck"), template)
    assert int(restored.step) == 1
    for a, b in zip(
        jax.tree.leaves(restored.params),
        jax.tree.leaves(jax.device_get(state.params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_accepts_tensor_config(tmp_path):
    """parallel.tensor threads from YAML through the Trainer with the
    monitor→classifier→nudger control path LIVE: the nudge fetches a
    tensor-sharded γ (fully addressable single-process) and feeds an
    uncommitted host array back into the TP-sharded step; the final vae
    export gathers the shards."""
    import os

    from vae_channel_dynamics_tpu.training.loop import Trainer

    config = {
        "run_name": "tp_smoke",
        "output_dir": str(tmp_path),
        "seed": 0,
        "model": {"architecture": "tiny", "pretrained_vae_name": None},
        "data": {
            "dataset_name": "synthetic://noise",
            "resolution": 16,
            "max_samples": 8,
            "batch_size": 2,  # global batch 8 over the 4-way data axis
            "num_workers": 0,
            "do_validation": False,
        },
        "training": {
            "num_train_epochs": 4,
            "learning_rate": 1e-4,
            "mixed_precision": "no",
            "kl_weight": 1e-6,
            "max_grad_norm": 1.0,
        },
        "logging": {"log_interval": 1, "report_to": "jsonl"},
        "saving": {"save_interval_steps": 1000},
        "tracking": {
            "enabled": True,
            "track_interval": 2,
            "target_layers": [
                {
                    "name": "vae.encoder.down_blocks.0.resnets.0.norm1",
                    "capture_point": "output",
                    "metrics": ["mean_abs_activation_per_channel"],
                }
            ],
        },
        "dead_neuron_tracking": {"enabled": False},
        "logit_lens": {"enabled": False},
        "classification": {
            "enabled": True,
            "method": "threshold_groupnorm_activity",
            "threshold": 1e6,  # every channel inactive → nudge always fires
            "target_metric_key": "mean_abs_activation_per_channel",
            "layers_to_classify": [
                "vae.encoder.down_blocks.0.resnets.0.norm1.output",
            ],
        },
        "intervention": {
            "enabled": True,
            "strategy": "gentle_nudge_groupnorm_scale",
            "nudge_factor": 1.2,
            "max_scale_value": 1.5,
            "intervention_interval": 2,
        },
        "parallel": {"tensor": 2},
    }
    summary = Trainer(config).train()
    assert summary["global_step"] >= 1
    assert os.path.isdir(os.path.join(summary["final_model_dir"], "vae"))
    with open(
        os.path.join(str(tmp_path), "tp_smoke", "intervention_history.csv")
    ) as fh:
        assert fh.read().strip(), "expected nudges recorded"


def test_tp_composes_with_slices():
    """slice x data x tensor (2x2x2): the multi-slice DCN layout composed
    with channel parallelism — allowed (no halo convs involved: the slice
    axis only shards the batch, so the spatial x tensor miscompile guard
    does not apply) and loss-identical to the replicated oracle on the
    same global batch."""
    mesh_s = make_mesh(8, slices=2, tensor=2)
    assert dict(mesh_s.shape) == {"slice": 2, "data": 2, "tensor": 2}
    mesh_r = make_mesh(4)
    _, state_s, step_s = _setup(mesh_s, sharded=True)
    _, state_r, step_r = _setup(mesh_r, sharded=False)
    sharded = [
        leaf
        for leaf in jax.tree.leaves(state_s.params)
        if not leaf.sharding.is_fully_replicated
    ]
    assert sharded, "expected tensor-sharded leaves on the 3-axis mesh"
    batch, mask = _batch(8, seed=11)
    rng = jax.random.PRNGKey(13)
    state_s, met_s, _ = step_s(state_s, batch, mask, rng)
    state_r, met_r, _ = step_r(state_r, batch, mask, rng)
    np.testing.assert_allclose(
        float(met_s["train_loss_step"]), float(met_r["train_loss_step"]),
        rtol=2e-5,
    )
