"""ZeRO-1 optimizer-state sharding (``parallel.shard_optimizer``).

The reference replicates the full torch AdamW state on every GPU
(src/train.py:184-211). Here the moments can shard over the mesh's data
axis purely via sharding annotations; these tests pin (a) the per-leaf
axis choice, (b) that the sharded-state train step matches the replicated
one up to fp32 reduction-order noise, (c) that the moments really are
distributed (1/N per device), (d) that checkpoints save/restore through
the sharded layout, and (e) the YAML key threads through the Trainer."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
from vae_channel_dynamics_tpu.parallel import make_mesh
from vae_channel_dynamics_tpu.parallel.mesh import DATA_AXIS, replicated_sharding
from vae_channel_dynamics_tpu.parallel.zero import (
    _leaf_spec,
    opt_state_shardings,
    state_shardings,
)
from vae_channel_dynamics_tpu.training import (
    TrainState,
    build_optimizer,
    make_train_step,
)
from vae_channel_dynamics_tpu.training.checkpoint import (
    restore_train_state,
    save_train_state,
)


def test_leaf_spec_axis_choice():
    # scalars (Adam count) and small leaves stay replicated
    assert _leaf_spec((), 8) == P()
    assert _leaf_spec((4,), 8) == P()
    assert _leaf_spec((5, 7), 8) == P()
    # vectors (biases, GroupNorm gamma/beta) shard their only axis
    assert _leaf_spec((32,), 8) == P(DATA_AXIS)
    # conv kernels (HWIO): largest divisible dim, ties prefer the LAST
    # axis so equal I/O sizes shard output channels
    assert _leaf_spec((3, 3, 16, 32), 8) == P(None, None, None, DATA_AXIS)
    assert _leaf_spec((3, 3, 32, 32), 8) == P(None, None, None, DATA_AXIS)
    assert _leaf_spec((3, 3, 64, 32), 8) == P(None, None, DATA_AXIS, None)


def _setup(
    mesh, shard_optimizer, accum=1, ema_decay=0.0, shard_ema=False,
    shard_params=False,
):
    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(
        1e-3, warmup_steps=2, max_train_steps=100,
        gradient_accumulation_steps=accum,
    )
    state = TrainState.create(params, tx, ema=ema_decay > 0.0)
    sharding = (
        state_shardings(
            mesh, state, shard_optimizer=shard_optimizer,
            shard_ema=shard_ema, shard_params=shard_params,
        )
        if (shard_optimizer or shard_ema or shard_params)
        else None
    )
    state = jax.device_put(
        state, sharding if sharding is not None else replicated_sharding(mesh)
    )
    step = make_train_step(
        module, tx, 1e-6, mesh=mesh, donate=False, state_sharding=sharding,
        ema_decay=ema_decay,
    )
    return state, step


def _batch(n=8, r=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "pixel_values": rng.uniform(-1, 1, (n, r, r, 3)).astype(np.float32)
    }, np.ones(n, np.float32)


def _moment_leaves(opt_state):
    """Leaves of the optimizer state large enough that sharding applies."""
    return [
        leaf
        for leaf in jax.tree.leaves(opt_state)
        if hasattr(leaf, "shape") and any(d % 8 == 0 and d >= 8 for d in leaf.shape)
    ]


def test_zero1_matches_replicated_and_distributes_moments():
    mesh = make_mesh(8)
    state_r, step_r = _setup(mesh, shard_optimizer=False)
    state_z, step_z = _setup(mesh, shard_optimizer=True)

    # the moments really live 1/8th-per-device
    sharded = _moment_leaves(state_z.opt_state)
    assert sharded, "expected shardable optimizer-state leaves"
    for leaf in sharded:
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        assert int(np.prod(shard_shape)) * 8 == leaf.size, (
            leaf.shape, shard_shape,
        )
    # params stay replicated (ZeRO-1, not ZeRO-3)
    for leaf in jax.tree.leaves(state_z.params):
        assert leaf.sharding.is_fully_replicated

    batch, mask = _batch(8, seed=3)
    rng = jax.random.PRNGKey(7)
    for _ in range(3):
        state_r, met_r, _ = step_r(state_r, batch, mask, rng)
        state_z, met_z, _ = step_z(state_z, batch, mask, rng)
    np.testing.assert_allclose(
        float(met_r["train_loss_step"]), float(met_z["train_loss_step"]),
        rtol=2e-5,
    )
    # ZeRO changes the gradient-reduction schedule (reduce-scatter vs
    # all-reduce), so fp32 sums reassociate: parity is up to reduction-order
    # noise (~3e-6 absolute after 3 Adam steps), not bit-exact
    for a, b in zip(jax.tree.leaves(state_r.params), jax.tree.leaves(state_z.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )
    # the updated moments still carry the sharded layout (out_shardings)
    for leaf in _moment_leaves(state_z.opt_state):
        assert not leaf.sharding.is_fully_replicated


def test_zero1_composes_with_grad_accumulation():
    """optax.MultiSteps wraps the state (adds mini_step + acc_grads with
    param shapes); the leaf-wise sharding must still apply and agree with
    the replicated numbers."""
    mesh = make_mesh(8)
    state_r, step_r = _setup(mesh, shard_optimizer=False, accum=2)
    state_z, step_z = _setup(mesh, shard_optimizer=True, accum=2)
    batch, mask = _batch(8, seed=5)
    rng = jax.random.PRNGKey(11)
    for _ in range(4):  # two full optimizer updates
        state_r, met_r, _ = step_r(state_r, batch, mask, rng)
        state_z, met_z, _ = step_z(state_z, batch, mask, rng)
    np.testing.assert_allclose(
        float(met_r["train_loss_step"]), float(met_z["train_loss_step"]),
        rtol=2e-5,
    )
    for a, b in zip(jax.tree.leaves(state_r.params), jax.tree.leaves(state_z.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )


def test_shard_ema_distributes_and_matches_replicated():
    """parallel.shard_ema: the EMA copy lives 1/N-per-device, the blend is
    elementwise (each device reads its local slice of the replicated
    params), and the EMA trajectory matches the replicated run. Even with
    the optimizer unsharded, the sharded EMA consuming param slices makes
    XLA pick a different gradient-reduction/fusion schedule, so parity is
    up to fp32 reduction-order noise — the same tolerance as the ZeRO-1
    param check above."""
    mesh = make_mesh(8)
    state_r, step_r = _setup(mesh, shard_optimizer=False, ema_decay=0.9)
    state_z, step_z = _setup(
        mesh, shard_optimizer=False, ema_decay=0.9, shard_ema=True
    )

    for leaf in _moment_leaves(state_z.ema_params):
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        assert int(np.prod(shard_shape)) * 8 == leaf.size, (
            leaf.shape, shard_shape,
        )
    # params themselves stay replicated
    for leaf in jax.tree.leaves(state_z.params):
        assert leaf.sharding.is_fully_replicated

    batch, mask = _batch(8, seed=13)
    rng = jax.random.PRNGKey(17)
    for _ in range(3):
        state_r, _, _ = step_r(state_r, batch, mask, rng)
        state_z, _, _ = step_z(state_z, batch, mask, rng)
    # device_get gathers the sharded EMA before comparing
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state_r.ema_params)),
        jax.tree.leaves(jax.device_get(state_z.ema_params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )
    # out_shardings keep the updated EMA distributed
    for leaf in _moment_leaves(state_z.ema_params):
        assert not leaf.sharding.is_fully_replicated


def test_zero3_matches_replicated_and_distributes_params():
    """parallel.shard_params (ZeRO-3): the persistent parameter buffers
    live 1/N-per-device (XLA gathers each weight at its point of use in
    the forward/backward), the trajectory matches the replicated run up
    to fp32 reduction-order noise, and the post-update params keep the
    sharded layout. Run with the full ZeRO stack (moments + EMA + params)
    — the production configuration."""
    mesh = make_mesh(8)
    state_r, step_r = _setup(mesh, shard_optimizer=False, ema_decay=0.9)
    state_z, step_z = _setup(
        mesh, shard_optimizer=True, ema_decay=0.9, shard_ema=True,
        shard_params=True,
    )

    sharded = _moment_leaves(state_z.params)
    assert sharded, "expected shardable param leaves"
    for leaf in sharded:
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        assert int(np.prod(shard_shape)) * 8 == leaf.size, (
            leaf.shape, shard_shape,
        )

    batch, mask = _batch(8, seed=29)
    rng = jax.random.PRNGKey(31)
    for _ in range(3):
        state_r, met_r, _ = step_r(state_r, batch, mask, rng)
        state_z, met_z, _ = step_z(state_z, batch, mask, rng)
    np.testing.assert_allclose(
        float(met_r["train_loss_step"]), float(met_z["train_loss_step"]),
        rtol=2e-5,
    )
    # device_get gathers the sharded params/EMA before comparing
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state_r.params)),
        jax.tree.leaves(jax.device_get(state_z.params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state_r.ema_params)),
        jax.tree.leaves(jax.device_get(state_z.ema_params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )
    # out_shardings keep the updated params distributed
    for leaf in _moment_leaves(state_z.params):
        assert not leaf.sharding.is_fully_replicated


def test_zero3_eval_step_accepts_sharded_params():
    """Validation must run on the live (sharded) params: make_eval_step
    threads the params sharding into its in_shardings, and the losses
    match an eval on the gathered replicated copy."""
    from vae_channel_dynamics_tpu.training import make_eval_step

    mesh = make_mesh(8)
    state_z, step_z = _setup(mesh, shard_optimizer=True, shard_params=True)
    batch, mask = _batch(8, seed=33)
    state_z, _, _ = step_z(state_z, batch, mask, jax.random.PRNGKey(5))

    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    from vae_channel_dynamics_tpu.parallel.zero import opt_state_shardings

    eval_sharded = make_eval_step(
        module, mesh=mesh,
        params_sharding=opt_state_shardings(mesh, state_z.params),
    )
    eval_repl = make_eval_step(module, mesh=mesh)
    batch_dev = {"pixel_values": jnp.asarray(batch["pixel_values"])}
    mask_dev = jnp.asarray(mask)
    out_s = eval_sharded(state_z.params, batch_dev, mask_dev)
    out_r = eval_repl(jax.device_get(state_z.params), batch_dev, mask_dev)
    np.testing.assert_allclose(
        float(out_s["rec_loss_sum"]), float(out_r["rec_loss_sum"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(out_s["kl_sum"]), float(out_r["kl_sum"]), rtol=1e-5, atol=1e-6
    )


def test_sharded_ema_checkpoint_roundtrip(tmp_path):
    """EMA checkpoints are layout-independent: save with the EMA sharded,
    restore into a fresh host template, compare against the live state."""
    mesh = make_mesh(8)
    state_z, step_z = _setup(
        mesh, shard_optimizer=True, ema_decay=0.9, shard_ema=True
    )
    batch, mask = _batch(8, seed=21)
    state_z, _, _ = step_z(state_z, batch, mask, jax.random.PRNGKey(2))

    save_train_state(str(tmp_path / "ck"), state_z)

    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(1e-3, warmup_steps=2, max_train_steps=100)
    template = TrainState.create(params, tx, ema=True)
    restored = restore_train_state(str(tmp_path / "ck"), template)
    for a, b in zip(
        jax.tree.leaves(restored.ema_params),
        jax.tree.leaves(jax.device_get(state_z.ema_params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_state_checkpoint_roundtrip(tmp_path):
    """device_get on the sharded moments gathers the full arrays, so the
    checkpoint format is layout-independent: save sharded, restore into a
    fresh (host) template, and compare against the live state."""
    mesh = make_mesh(8)
    state_z, step_z = _setup(mesh, shard_optimizer=True)
    batch, mask = _batch(8, seed=9)
    state_z, _, _ = step_z(state_z, batch, mask, jax.random.PRNGKey(0))

    save_train_state(str(tmp_path / "ck"), state_z)

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
        jax.tree.leaves(restored.opt_state), jax.tree.leaves(state_z.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_accepts_shard_optimizer_config(tmp_path):
    """parallel.shard_optimizer + shard_ema + shard_params thread from
    YAML through the Trainer with the monitor→classifier→nudger control
    path LIVE (the nudge fetches a ZeRO-3-sharded γ and feeds an
    uncommitted host array back into the sharded step) and dead tracking
    snapshotting a sharded raw weight; the final vae/vae_ema exports
    gather the sharded copies."""
    from vae_channel_dynamics_tpu.training.loop import Trainer

    config = {
        "run_name": "zero_smoke",
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
            # global batch 16 (= max_samples) → 1 step/epoch; 4 epochs so
            # the interval-2 track/classify/nudge path fires twice
            "num_train_epochs": 4,
            "learning_rate": 1e-4,
            "mixed_precision": "no",
            "kl_weight": 1e-6,
            "max_grad_norm": 1.0,
            "ema_decay": 0.5,
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
        "dead_neuron_tracking": {
            "enabled": True,
            "track_interval": 2,
            "target_layer_names_for_raw_weights": [
                "vae.encoder.down_blocks.0.resnets.0.norm1.weight",
            ],
        },
        "logit_lens": {"enabled": False},
        "classification": {
            "enabled": True,
            "method": "threshold_groupnorm_activity",
            # far above any real activation so the nudge always fires
            "threshold": 1e6,
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
        "parallel": {
            "shard_optimizer": True, "shard_ema": True, "shard_params": True,
        },
    }
    summary = Trainer(config).train()
    assert summary["global_step"] >= 1
    # the sharded params/EMA gathered and exported as bare model dirs
    import os

    assert os.path.isdir(os.path.join(summary["final_model_dir"], "vae"))
    assert os.path.isdir(summary["ema_model_dir"])
    # the control path really fired on the sharded params
    with open(os.path.join(str(tmp_path), "zero_smoke",
                           "intervention_history.csv")) as fh:
        assert fh.read().strip(), "expected nudges recorded"
