"""training.optimizer: adamw (default, torch parity) | adafactor.

The reference trains with torch AdamW only (src/train.py:184-196); the
adamw path's torch-trajectory parity is pinned separately in
test_train_trajectory_torch_parity.py. ``adafactor`` is a [new] option:
factored second moments (O(rows+cols) per matrix) and no momentum — the
standard TPU memory-efficient optimizer. These tests pin (a) the wiring
trains (finite, decreasing loss), (b) the state really is smaller than
AdamW's, (c) factoring produces vector statistics for large matrices,
(d) unknown names fail loudly, and (e) the YAML key threads through the
Trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
from vae_channel_dynamics_tpu.training import (
    TrainState,
    build_optimizer,
    make_train_step,
)


def _init_tiny():
    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        sample_posterior=False,
    )["params"]
    return module, params


def _state_size(opt_state) -> int:
    return sum(
        leaf.size for leaf in jax.tree.leaves(opt_state) if hasattr(leaf, "size")
    )


def test_adafactor_trains_and_uses_less_memory():
    module, params = _init_tiny()
    tx_af, _ = build_optimizer(1e-3, 2, 50, optimizer="adafactor")
    tx_aw, _ = build_optimizer(1e-3, 2, 50, optimizer="adamw")
    state = TrainState.create(params, tx_af)

    # no momentum + at-worst-unfactored second moment ⇒ strictly smaller
    # than AdamW's two full moments, even on the tiny model where no dim
    # reaches adafactor's factoring threshold
    size_af = _state_size(state.opt_state)
    size_aw = _state_size(TrainState.create(params, tx_aw).opt_state)
    assert size_af < size_aw, (size_af, size_aw)

    step = make_train_step(module, tx_af, 1e-6, donate=False)
    rng = np.random.default_rng(3)
    batch = {
        "pixel_values": rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    }
    mask = np.ones(4, np.float32)
    losses = []
    for _ in range(5):
        state, metrics, _ = step(state, batch, mask, jax.random.PRNGKey(7))
        losses.append(float(metrics["train_loss_step"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_adafactor_factors_large_matrices():
    """For a (256, 512) kernel the second-moment statistics must be the
    factored row/col vectors, not the full matrix — the memory claim."""
    params = {"w": jnp.zeros((256, 512), jnp.float32)}
    tx, _ = build_optimizer(1e-3, 0, 10, optimizer="adafactor")
    opt_state = tx.init(params)
    sizes = sorted(
        leaf.size
        for leaf in jax.tree.leaves(opt_state)
        if hasattr(leaf, "size")
    )
    # no leaf may hold a full 256*512 moment; factored stats are 256 + 512
    assert max(sizes) < 256 * 512, sizes
    assert 256 in sizes and 512 in sizes, sizes


def test_adafactor_composes_with_zero1():
    """parallel.shard_optimizer shards whatever state the optimizer keeps:
    with adafactor the shardable statistics distribute 1/N-per-device and
    the step still trains."""
    from vae_channel_dynamics_tpu.parallel import make_mesh
    from vae_channel_dynamics_tpu.parallel.zero import state_shardings

    mesh = make_mesh(8)
    module, params = _init_tiny()
    tx, _ = build_optimizer(1e-3, 2, 50, optimizer="adafactor")
    state = TrainState.create(params, tx)
    sharding = state_shardings(mesh, state, shard_optimizer=True)
    state = jax.device_put(state, sharding)
    sharded = [
        leaf
        for leaf in jax.tree.leaves(state.opt_state)
        if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
    ]
    assert sharded, "expected shardable adafactor statistics"
    for leaf in sharded:
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        assert int(np.prod(shard_shape)) * 8 == leaf.size

    step = make_train_step(
        module, tx, 1e-6, mesh=mesh, donate=False, state_sharding=sharding
    )
    rng = np.random.default_rng(9)
    batch = {
        "pixel_values": rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
    }
    mask = np.ones(8, np.float32)
    state, metrics, _ = step(state, batch, mask, jax.random.PRNGKey(11))
    assert np.isfinite(float(metrics["train_loss_step"]))


def test_unknown_optimizer_fails_loudly():
    with pytest.raises(ValueError, match="Unknown training.optimizer"):
        build_optimizer(1e-3, 0, 10, optimizer="sgd")


def test_trainer_accepts_adafactor_config(tmp_path):
    """training.optimizer threads from YAML through the Trainer and the
    run completes with the usual artifacts."""
    from vae_channel_dynamics_tpu.training.loop import Trainer

    config = {
        "run_name": "adafactor_smoke",
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
            "optimizer": "adafactor",
        },
        "logging": {"log_interval": 1, "report_to": "jsonl"},
        "saving": {"save_interval_steps": 1000},
        "tracking": {"enabled": False},
        "dead_neuron_tracking": {"enabled": False},
        "logit_lens": {"enabled": False},
        "classification": {"enabled": False},
        "intervention": {"enabled": False},
    }
    summary = Trainer(config).train()
    assert summary["global_step"] >= 1
    import os

    assert os.path.isdir(os.path.join(summary["final_model_dir"], "vae"))


# ---------------------------------------------------------------------------
# training.lr_scheduler_type — the reference reads this key and IGNORES it
# (quirk SURVEY.md 5a-1: src/train.py:197-202 always builds the linear
# LambdaLR; configs/base_config.yaml:36 advertises "linear", "cosine",
# "constant"). Deliberate documented deviation: we honor the advertised
# values. Every shipped reference YAML sets "linear" (or omits the key), so
# reference configs run bit-identically; the tests below pin each schedule's
# shape, the linear default, and the warn-and-fall-back path for unknown
# names (never crash — the reference's effective behavior).
# ---------------------------------------------------------------------------

from vae_channel_dynamics_tpu.training import make_lr_schedule


def _sched_vals(name, pts, lr=1e-3, warmup=10, total=100):
    s = make_lr_schedule(name, lr, warmup, total)
    return [float(s(p)) for p in pts]


def test_linear_schedule_shape_and_default():
    # warmup 0->lr over 10 steps, then linear decay to 0 at step 100
    vals = _sched_vals("linear", [0, 5, 10, 55, 100])
    assert vals[0] == 0.0
    assert np.isclose(vals[1], 0.5e-3)
    assert np.isclose(vals[2], 1e-3)
    assert np.isclose(vals[3], 0.5e-3)
    assert np.isclose(vals[4], 0.0)
    # build_optimizer's default schedule IS linear (reference parity)
    _, sched = build_optimizer(1e-3, warmup_steps=10, max_train_steps=100)
    assert np.isclose(float(sched(55)), 0.5e-3)


def test_cosine_schedule_shape():
    # HF get_scheduler convention: linear warmup, half-cosine decay to 0
    vals = _sched_vals("cosine", [0, 5, 10, 55, 100, 200])
    assert vals[0] == 0.0
    assert np.isclose(vals[1], 0.5e-3)
    assert np.isclose(vals[2], 1e-3)
    assert np.isclose(vals[3], 0.5e-3)  # cos(pi/2) midpoint
    assert np.isclose(vals[4], 0.0, atol=1e-12)
    assert np.isclose(vals[5], 0.0, atol=1e-12)  # clipped past the end
    # strictly decreasing after warmup
    dense = _sched_vals("cosine", list(range(10, 101, 10)))
    assert all(a > b for a, b in zip(dense, dense[1:]))


def test_constant_schedules():
    # Schedules run inside jit and return float32 — 1e-3 is not exactly
    # representable there, so compare with np.isclose like the siblings
    # above (exact Python-float equality was a red-suite bug, VERDICT r4).
    assert np.allclose(_sched_vals("constant", [0, 7, 1000]), [1e-3] * 3)
    vals = _sched_vals("constant_with_warmup", [0, 5, 10, 1000])
    assert vals[0] == 0.0
    assert np.isclose(vals[1], 0.5e-3)
    assert np.allclose(vals[2:], [1e-3, 1e-3])


def test_constant_with_warmup_zero_warmup_degenerates_to_constant():
    # HF convention: current_step >= num_warmup_steps returns base_lr,
    # including warmup_steps=0 — lr at step 0 must be base_lr, not 0.
    vals = _sched_vals("constant_with_warmup", [0, 1, 50], warmup=0)
    assert np.allclose(vals, [1e-3] * 3)


def test_unknown_scheduler_warns_and_falls_back_to_linear(caplog):
    import logging as _logging

    with caplog.at_level(_logging.WARNING):
        vals = _sched_vals("cosine_with_restarts", [0, 5, 10, 55, 100])
    assert vals == _sched_vals("linear", [0, 5, 10, 55, 100])
    assert any("lr_scheduler_type" in r.message for r in caplog.records)


def test_trainer_threads_lr_scheduler_type(tmp_path):
    """training.lr_scheduler_type: cosine reaches build_optimizer through
    the Trainer and the run completes with the usual artifacts."""
    from vae_channel_dynamics_tpu.training.loop import Trainer

    config = {
        "run_name": "cosine_smoke",
        "output_dir": str(tmp_path),
        "seed": 0,
        "model": {"architecture": "tiny", "pretrained_vae_name": None},
        "data": {
            "dataset_name": "synthetic://noise",
            "resolution": 16,
            "max_samples": 8,
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
            "lr_scheduler_type": "cosine",
        },
        "logging": {"log_interval": 1, "report_to": "jsonl"},
        "saving": {"save_interval_steps": 1000},
        "tracking": {"enabled": False},
        "dead_neuron_tracking": {"enabled": False},
        "logit_lens": {"enabled": False},
        "classification": {"enabled": False},
        "intervention": {"enabled": False},
    }
    summary = Trainer(config).train()
    assert summary["global_step"] >= 1
