"""Train/eval step: learning, sharding parity, schedule, masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
from vae_channel_dynamics_tpu.parallel import make_mesh
from vae_channel_dynamics_tpu.parallel.mesh import pad_batch_to_multiple
from vae_channel_dynamics_tpu.training import (
    TrainState,
    build_optimizer,
    linear_warmup_decay_schedule,
    make_eval_step,
    make_train_step,
)


def _setup(mesh=None, kl_weight=1e-6):
    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        sample_posterior=False,
    )["params"]
    tx, sched = build_optimizer(1e-3, warmup_steps=2, max_train_steps=100)
    state = TrainState.create(params, tx)
    step = make_train_step(module, tx, kl_weight, mesh=mesh, donate=False)
    return module, state, step, sched


def _batch(n=8, r=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "pixel_values": rng.uniform(-1, 1, (n, r, r, 3)).astype(np.float32)
    }, np.ones(n, np.float32)


def test_schedule_matches_lambda_lr():
    sched = linear_warmup_decay_schedule(2.0, warmup_steps=4, max_train_steps=10)
    # torch LambdaLR: lr(k) = base * lambda(k), lambda(0)=0 with warmup
    assert float(sched(0)) == 0.0
    assert float(sched(2)) == pytest.approx(1.0)
    assert float(sched(4)) == pytest.approx(2.0)  # end of warmup
    assert float(sched(7)) == pytest.approx(2.0 * (1 - 3 / 6))
    assert float(sched(10)) == pytest.approx(0.0)
    assert float(sched(15)) == pytest.approx(0.0)  # clamped


def test_train_step_learns():
    _, state, step, _ = _setup()
    batch, mask = _batch()
    rng = jax.random.PRNGKey(42)
    losses = []
    for _ in range(6):
        state, metrics, maps = step(state, batch, mask, rng)
        losses.append(float(metrics["train_loss_step"]))
    assert maps == {}
    assert int(state.step) == 6
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))


def test_metrics_shapes_and_grad_norm():
    _, state, step, _ = _setup()
    batch, mask = _batch(4)
    state, metrics, _ = step(state, batch, mask, jax.random.PRNGKey(0))
    for k in ("train_loss_step", "rec_loss", "kl_loss", "grad_norm"):
        assert np.asarray(metrics[k]).shape == ()
        assert np.isfinite(float(metrics[k]))
    assert float(metrics["grad_norm"]) > 0


def test_mesh_parity_with_single_device():
    """8-way data-parallel step must produce the same numbers as the
    unsharded step (the DDP-equivalence guarantee)."""
    mesh = make_mesh(8)
    _, state_s, step_s, _ = _setup(mesh=None)
    _, state_m, step_m, _ = _setup(mesh=mesh)
    batch, mask = _batch(8, seed=3)
    rng = jax.random.PRNGKey(7)
    for _ in range(3):
        state_s, met_s, _ = step_s(state_s, batch, mask, rng)
        state_m, met_m, _ = step_m(state_m, batch, mask, rng)
    np.testing.assert_allclose(
        float(met_s["train_loss_step"]), float(met_m["train_loss_step"]),
        rtol=2e-4,
    )
    # parameters stay in lockstep across shards and match the reference run
    leaf_s = jax.tree.leaves(state_s.params)[0]
    leaf_m = jax.tree.leaves(state_m.params)[0]
    np.testing.assert_allclose(
        np.asarray(leaf_s), np.asarray(leaf_m), rtol=1e-4, atol=1e-6
    )


def test_masked_padding_matches_unpadded():
    """A remainder batch padded to the mesh multiple must give the same loss
    as the raw remainder batch (mask-weighted means)."""
    _, state, step, _ = _setup()
    raw, _ = _batch(5, seed=9)
    padded, mask = pad_batch_to_multiple(raw, 8)
    assert padded["pixel_values"].shape[0] == 8
    assert mask.sum() == 5
    s1, met_pad, _ = step(state, padded, mask, jax.random.PRNGKey(0))

    _, state2, step2, _ = _setup()
    s2, met_raw, _ = step2(state2, raw, np.ones(5, np.float32), jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(met_pad["rec_loss"]), float(met_raw["rec_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(met_pad["kl_loss"]), float(met_raw["kl_loss"]), rtol=1e-4
    )


def test_eval_step_sum_conventions():
    module, state, _, _ = _setup()
    eval_step = make_eval_step(module)
    batch, mask = _batch(4, seed=5)
    out = eval_step(state.params, batch, mask)
    assert float(out["num_samples"]) == 4.0
    # rec_loss_sum is the total squared error (validation convention)
    recon = np.asarray(out["reconstruction"], np.float32)
    expected = np.sum((recon - batch["pixel_values"]) ** 2)
    np.testing.assert_allclose(float(out["rec_loss_sum"]), expected, rtol=1e-4)
    # mse_mean_weighted / num_samples == per-element mean MSE (eval convention)
    per_elem = expected / recon.size
    np.testing.assert_allclose(
        float(out["mse_mean_weighted"]) / float(out["num_samples"]),
        per_elem,
        rtol=1e-5,
    )


def test_gradient_accumulation_equivalence():
    """MultiSteps(k=2) over two half-batches ~ single step over the full
    batch (AdamW normalizes by grad magnitude, so compare the applied
    update after the accumulation boundary)."""
    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        sample_posterior=False,
    )["params"]
    batch, mask = _batch(8, seed=11)

    tx_full, _ = build_optimizer(1e-3, 0, 100)
    st_full = TrainState.create(params, tx_full)
    step_full = make_train_step(module, tx_full, 1e-6, donate=False)
    st_full, _, _ = step_full(st_full, batch, mask, jax.random.PRNGKey(2))

    tx_acc, _ = build_optimizer(1e-3, 0, 100, gradient_accumulation_steps=2)
    st_acc = TrainState.create(params, tx_acc)
    step_acc = make_train_step(module, tx_acc, 1e-6, donate=False)
    half = {"pixel_values": batch["pixel_values"][:4]}
    half2 = {"pixel_values": batch["pixel_values"][4:]}
    m4 = np.ones(4, np.float32)
    st_acc, _, _ = step_acc(st_acc, half, m4, jax.random.PRNGKey(2))
    st_acc, _, _ = step_acc(st_acc, half2, m4, jax.random.PRNGKey(2))

    # both applied exactly one optimizer update of similar magnitude
    delta_full = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(), st_full.params, params)
    delta_acc = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(), st_acc.params, params)
    d_full = max(jax.tree.leaves(delta_full))
    d_acc = max(jax.tree.leaves(delta_acc))
    assert d_full > 0 and d_acc > 0
    assert d_acc == pytest.approx(d_full, rel=0.5)


def test_map_keys_variant_returns_full_maps():
    """The interval-step variant must return full activation maps (NCHW)
    while keeping scalar stats flowing into the state accumulator."""
    from vae_channel_dynamics_tpu.tracking import ActivityMonitor

    monitor = ActivityMonitor(
        {
            "enabled": True,
            "track_interval": 1,
            "target_layers": [
                {
                    "name": "vae.encoder.conv_in",
                    "capture_point": "output",
                    "metrics": [
                        "mean_abs_activation_per_channel",
                        "full_activation_map",
                    ],
                }
            ],
        }
    )
    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg, capture=monitor.map_capture_table)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(1e-3, 0, 10)
    acc = monitor.init_acc(module, params, (4, 16, 16, 3))
    assert list(acc) == ["encoder.conv_in.output.mean_abs_activation_per_channel"]
    state = TrainState.create(params, tx, stats_acc=acc)
    step = make_train_step(
        module, tx, 1e-6,
        stats_accumulate=ActivityMonitor.accumulate,
        map_keys=monitor.map_keys, donate=False,
    )
    batch, mask = _batch(4)
    state, _metrics, maps = step(state, batch, mask, jax.random.PRNGKey(0))
    key = "encoder.conv_in.output.full_activation_map"
    assert key in maps
    assert maps[key].shape == (4, 16, 16, 16)  # NCHW
    # scalar stat accumulated once
    acc_val = np.asarray(
        state.stats_acc["encoder.conv_in.output.mean_abs_activation_per_channel"]
    )
    assert acc_val.shape == (16,) and acc_val.sum() > 0
    assert float(state.stats_count) == 1.0
    # monitor.step consumes both and produces the reference wandb keys
    wm = monitor.step(1, state.stats_acc, state.stats_count, maps)
    assert (
        "tracking/vae.encoder.conv_in.output/"
        "mean_abs_activation_per_channel_overall_mean" in wm
    )
    assert "tracking/vae.encoder.conv_in.output/full_activation_map_mean" in wm


def test_uint8_batch_under_mesh_matches_float():
    """uint8 transfer composes with data-sharded SPMD: the dequantize slots
    into the sharded program and losses match the float path."""
    import jax

    from vae_channel_dynamics_tpu.data.pipeline import quantize_uint8
    from vae_channel_dynamics_tpu.parallel import make_mesh
    from vae_channel_dynamics_tpu.parallel.mesh import replicated_sharding

    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    rng = np.random.default_rng(5)
    floats = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
    q = quantize_uint8(floats)
    deq = q.astype(np.float32) / 127.5 - 1.0
    params_host = jax.device_get(
        module.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, 32, 32, 3)),
            sample_posterior=False,
        )["params"]
    )
    mesh = make_mesh()
    mask = np.ones(8, np.float32)
    losses = {}
    for name, batch in (("uint8", q), ("float", deq)):
        tx, _ = build_optimizer(1e-4, warmup_steps=1, max_train_steps=10)
        # fresh device buffers each round: the sharded step donates the state
        state = TrainState.create(jax.device_put(params_host), tx, stats_acc={})
        state = jax.device_put(state, replicated_sharding(mesh))
        step = make_train_step(module, tx, 1e-6, mesh=mesh)
        _, metrics, _ = step(
            state, {"pixel_values": batch}, mask, jax.random.PRNGKey(3)
        )
        losses[name] = float(jax.device_get(metrics["train_loss_step"]))
    np.testing.assert_allclose(losses["uint8"], losses["float"], rtol=1e-6)


def test_ema_updates_once_per_optimizer_update_under_accumulation():
    """With gradient_accumulation_steps=k, the EMA must blend ONCE per
    applied optimizer update, not once per micro-step: blending on no-op
    micro-steps pulls the EMA toward unchanged params (1-d) at a time,
    giving an effective decay of d^k and shrinking the configured
    averaging horizon k-fold."""
    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        sample_posterior=False,
    )["params"]
    d = 0.5
    tx, _ = build_optimizer(1e-3, 0, 100, gradient_accumulation_steps=2)
    state = TrainState.create(params, tx, ema=True)
    step = make_train_step(module, tx, 1e-6, donate=False, ema_decay=d)
    batch, mask = _batch(4, seed=3)
    rng = jax.random.PRNGKey(2)

    p0 = jax.device_get(state.params)
    state, _, _ = step(state, batch, mask, rng)  # accumulate: no update
    # params unchanged, EMA must equal the init (== p0) exactly
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(p0)):
        np.testing.assert_array_equal(a, b)

    state, _, _ = step(state, batch, mask, rng)  # boundary: update + blend
    p1 = jax.device_get(state.params)
    expected_ema = jax.tree.map(
        lambda e, p: e * d + p * (1.0 - d), p0, p1
    )
    for a, b in zip(jax.tree.leaves(jax.device_get(state.ema_params)),
                    jax.tree.leaves(expected_ema)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)

    state, _, _ = step(state, batch, mask, rng)  # accumulate again: no-op
    # params unchanged at p1; EMA must NOT have drifted toward p1
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(p1)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(jax.device_get(state.ema_params)),
                    jax.tree.leaves(expected_ema)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)
