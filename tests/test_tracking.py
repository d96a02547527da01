"""Monitor, dead-weight tracker, classifier, nudger — semantics parity.

The assertions mirror the reference's executable __main__ self-tests
(deadneuron.py:118-204 exact percentages, nudger.py:175-305 nudge math,
monitor.py:277-360 wandb keys + CSV records)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_channel_dynamics_tpu.classification import RegionClassifier
from vae_channel_dynamics_tpu.intervention import InterventionHandler
from vae_channel_dynamics_tpu.tracking import ActivityMonitor, DeadNeuronTracker
from vae_channel_dynamics_tpu.utils import naming


# --------------------------------------------------------------------------- #
# DeadNeuronTracker
# --------------------------------------------------------------------------- #
def _dead_params():
    """Hand-placed near-zero weights with exactly computable percentages."""
    conv1 = np.full((3, 3, 3, 8), 0.001, np.float32)  # HWIO, 216 elements
    conv1[0, 0, 0, 0] = 1.0
    conv1[0, 0, 0, 1] = 1e-7
    return {
        "conv1": {"kernel": jnp.asarray(conv1), "bias": jnp.zeros(8)},
        "gn1": {
            "scale": jnp.full((8,), 1e-6),
            "bias": jnp.full((8,), 1e-7),
        },
    }


def test_dead_both_exact_percentages():
    params = _dead_params()
    tracker = DeadNeuronTracker(
        target_layer_names_for_raw_weights=["gn1.weight"],
        threshold=1e-5,
        mean_percentage=0.1,
        dead_type="both",
    )
    tracker.track_dead_neurons(params, global_step=0)
    # conv1.weight: one element 1e-7 -> fixed True; mean ~0.00099,
    # adaptive thr ~9.9e-5 -> True. 1/216 dead.
    hist = tracker.percent_history["conv1.weight"]
    assert hist[0][0] == 0
    assert hist[0][1] == pytest.approx(100.0 / 216, rel=1e-4)
    # gn1.weight: all 1e-6 -> fixed True, adaptive (1e-6 < 1e-7) False -> 0%
    assert tracker.percent_history["gn1.weight"][0][1] == 0.0
    # gn1.bias: all 1e-7 -> adaptive (1e-7 < 1e-8) False -> 0%
    assert tracker.percent_history["gn1.bias"][0][1] == 0.0

    # step 20 with clearly-alive weights
    params["conv1"]["kernel"] = jnp.ones((3, 3, 3, 8))
    tracker.track_dead_neurons(params, global_step=20)
    assert tracker.percent_history["conv1.weight"][1] == (20, 0.0)

    # raw snapshot: replace-not-append — exactly one entry after two tracks
    assert len(tracker.weights_history["gn1.weight"]) == 1
    assert tracker.weights_history["gn1.weight"][0].shape == (8,)


def test_dead_threshold_and_percent_of_mean():
    params = {"m": {"kernel": jnp.asarray(
        np.array([[0.0, 1e-9, 0.5, 1.0]], np.float32).reshape(1, 1, 1, 4)
    ), "bias": jnp.zeros(4)}}
    t1 = DeadNeuronTracker(threshold=1e-6, dead_type="threshold")
    t1.track_dead_neurons(params, 0)
    assert t1.percent_history["m.weight"][0][1] == pytest.approx(50.0)
    t2 = DeadNeuronTracker(mean_percentage=0.5, dead_type="percent_of_mean")
    t2.track_dead_neurons(params, 0)
    # mean|w| = 0.375; thr = 0.1875 -> two entries below -> 50%
    assert t2.percent_history["m.weight"][0][1] == pytest.approx(50.0)
    # all-zero special case
    zeros = {"z": {"kernel": jnp.zeros((1, 1, 1, 4)), "bias": jnp.zeros(4)}}
    t3 = DeadNeuronTracker(mean_percentage=0.5, dead_type="percent_of_mean")
    t3.track_dead_neurons(zeros, 0)
    assert t3.percent_history["z.weight"][0][1] == pytest.approx(100.0)


def test_dead_unknown_type_noop():
    tracker = DeadNeuronTracker(dead_type="bogus")
    tracker.track_dead_neurons(_dead_params(), 0)
    assert all(
        pct == 0.0 for hist in tracker.percent_history.values() for _, pct in hist
    )


# --------------------------------------------------------------------------- #
# RegionClassifier
# --------------------------------------------------------------------------- #
def _gn_params():
    return {
        "encoder": {
            "down_blocks_0": {
                "resnets_0": {
                    "norm1": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
                }
            }
        }
    }


def test_classifier_thresholding():
    clf = RegionClassifier(
        _gn_params(),
        {
            "enabled": True,
            "threshold": 0.5,
            "target_metric_key": "mean_abs_activation_per_channel",
            "layers_to_classify": ["vae.encoder.down_blocks.0.resnets.0.norm1.output"],
        },
    )
    vals = np.array([0.1, 0.6, 0.4, 0.2, 0.8, 0.3, 0.7, 0.05])
    tracked = {
        "vae.encoder.down_blocks.0.resnets.0.norm1.output": {
            "mean_abs_activation_per_channel": vals
        }
    }
    res = clf.classify(tracked, 0)
    key = "vae.encoder.down_blocks.0.resnets.0.norm1.output"
    assert key in res
    assert res[key]["inactive_channel_indices"] == [0, 2, 3, 5, 7]
    assert res[key]["param_name_scale"] == (
        "encoder.down_blocks.0.resnets.0.norm1.weight"
    )
    assert res[key]["threshold_value"] == 0.5
    np.testing.assert_allclose(
        res[key]["values_of_inactive_channels"], vals[[0, 2, 3, 5, 7]]
    )


def test_classifier_disabled_and_mismatch():
    clf = RegionClassifier(_gn_params(), {"enabled": False})
    assert clf.classify({"x": {}}, 0) == {}
    clf2 = RegionClassifier(
        _gn_params(), {"enabled": True, "threshold": 0.5}
    )
    # channel count mismatch -> skipped
    res = clf2.classify(
        {
            "encoder.down_blocks.0.resnets.0.norm1.output": {
                "mean_abs_activation_per_channel": np.zeros(4)
            }
        },
        0,
    )
    assert res == {}


# --------------------------------------------------------------------------- #
# InterventionHandler
# --------------------------------------------------------------------------- #
def test_gentle_nudge_math():
    params = _gn_params()
    params = naming.set_param(
        params,
        "encoder.down_blocks.0.resnets.0.norm1.weight",
        jnp.asarray([0.1, 1.0, 1.4, 0.5, 1.0, 1.0, 1.0, 1.0]),
    )
    handler = InterventionHandler(
        {
            "enabled": True,
            "strategy": "gentle_nudge_groupnorm_scale",
            "nudge_factor": 1.2,
            "max_scale_value": 1.5,
            "intervention_interval": 10,
        }
    )
    results = {
        "layer": {
            "param_name_scale": "encoder.down_blocks.0.resnets.0.norm1.weight",
            "inactive_channel_indices": [0, 2, 3],
        }
    }
    new = handler.intervene(params, results, global_step=10)
    gamma = np.asarray(
        naming.get_param(new, "encoder.down_blocks.0.resnets.0.norm1.weight")
    )
    # min(v * 1.2, 1.5)
    np.testing.assert_allclose(gamma[0], 0.12, rtol=1e-6)
    np.testing.assert_allclose(gamma[2], 1.5, rtol=1e-6)  # capped: 1.68 -> 1.5
    np.testing.assert_allclose(gamma[3], 0.6, rtol=1e-6)
    np.testing.assert_allclose(gamma[1], 1.0)  # untouched
    assert handler.num_nudges_applied == 3
    # original params untouched (functional update)
    orig = np.asarray(
        naming.get_param(params, "encoder.down_blocks.0.resnets.0.norm1.weight")
    )
    assert orig[0] == pytest.approx(0.1)


def test_reset_strategy_and_interval_gating():
    params = _gn_params()
    params = naming.set_param(
        params,
        "encoder.down_blocks.0.resnets.0.norm1.weight",
        jnp.asarray([0.1] * 8),
    )
    handler = InterventionHandler(
        {
            "enabled": True,
            "strategy": "reset_groupnorm_scale",
            "intervention_interval": 10,
        }
    )
    results = {
        "layer": {
            "param_name_scale": "encoder.down_blocks.0.resnets.0.norm1.weight",
            "inactive_channel_indices": [1, 5],
        }
    }
    # off-interval: no-op (nudger.py:94-97)
    same = handler.intervene(params, results, global_step=7)
    assert same is params
    # step 0: no-op even though 0 % 10 == 0
    same0 = handler.intervene(params, results, global_step=0)
    assert same0 is params
    new = handler.intervene(params, results, global_step=20)
    gamma = np.asarray(
        naming.get_param(new, "encoder.down_blocks.0.resnets.0.norm1.weight")
    )
    assert gamma[1] == 1.0 and gamma[5] == 1.0 and gamma[0] == pytest.approx(0.1)
    # out-of-bounds index is skipped with a warning, not an error
    handler.intervene(
        params,
        {"layer": {
            "param_name_scale": "encoder.down_blocks.0.resnets.0.norm1.weight",
            "inactive_channel_indices": [99],
        }},
        global_step=10,
    )
    assert handler.num_nudges_applied == 0


# --------------------------------------------------------------------------- #
# ActivityMonitor
# --------------------------------------------------------------------------- #
def _monitor_config():
    return {
        "enabled": True,
        "track_interval": 2,
        "target_layers": [
            {
                "name": "vae.encoder.conv_in",
                "capture_point": "output",
                "metrics": ["mean_abs_activation_per_channel", "mean_activation"],
            },
            {
                "name": "vae.encoder.conv_in",
                "capture_point": "input",
                "metrics": ["full_activation_map"],
            },
        ],
    }


def test_monitor_capture_tables():
    mon = ActivityMonitor(_monitor_config())
    assert mon.scalar_capture_table == (
        ("encoder.conv_in", "output",
         ("mean_abs_activation_per_channel", "mean_activation")),
    )
    assert ("encoder.conv_in", "input", ("full_activation_map",)) in mon.map_capture_table
    assert mon.map_keys == ("encoder.conv_in.input.full_activation_map",)


def test_monitor_aggregation_and_records():
    mon = ActivityMonitor(_monitor_config())
    key_pc = "encoder.conv_in.output.mean_abs_activation_per_channel"
    key_mean = "encoder.conv_in.output.mean_activation"
    acc = {key_pc: jnp.zeros(4), key_mean: jnp.zeros(())}
    # two forwards
    acc = ActivityMonitor.accumulate(
        acc, {key_pc: jnp.asarray([1.0, 2.0, 3.0, 4.0]), key_mean: jnp.asarray(0.5)}
    )
    acc = ActivityMonitor.accumulate(
        acc, {key_pc: jnp.asarray([3.0, 4.0, 5.0, 6.0]), key_mean: jnp.asarray(1.5)}
    )
    maps = {
        "encoder.conv_in.input.full_activation_map": jnp.ones((2, 3, 8, 8))
    }
    wandb_metrics = mon.step(2, acc, jnp.asarray(2.0), maps)

    ident = "vae.encoder.conv_in.output"
    assert wandb_metrics[
        f"tracking/{ident}/mean_abs_activation_per_channel_overall_mean"
    ] == pytest.approx(3.5)  # mean of [2,3,4,5]
    assert wandb_metrics[f"tracking/{ident}/mean_activation"] == pytest.approx(1.0)
    ident_in = "vae.encoder.conv_in.input"
    assert wandb_metrics[
        f"tracking/{ident_in}/full_activation_map_mean"
    ] == pytest.approx(1.0)

    data = mon.get_data_for_step(2)
    np.testing.assert_allclose(
        data[ident]["mean_abs_activation_per_channel"], [2, 3, 4, 5]
    )
    assert data[ident_in]["full_activation_map"].shape == (2, 3, 8, 8)

    records = mon.export_all_processed_data_to_records()
    types = {(r["layer_identifier"], r["metric_type"]) for r in records}
    assert (ident, "per_channel_overall_mean") in types
    assert (ident, "scalar") in types
    assert (ident_in, "full_map_shape") in types
    assert (ident_in, "full_map_max") in types
    pc_mean = [
        r for r in records
        if r["layer_identifier"] == ident
        and r["metric_type"] == "per_channel_overall_mean"
    ][0]
    assert pc_mean["metric_value"] == pytest.approx(3.5)
    assert pc_mean["global_step"] == 2


def test_monitor_disabled_is_inert():
    mon = ActivityMonitor({"enabled": False})
    assert mon.scalar_capture_table == ()
    assert mon.step(10, {}, jnp.asarray(0.0)) == {}


def test_max_map_history_evicts_to_summaries():
    """tracking.max_map_history bounds full-map host memory while keeping
    the CSV export records identical for evicted steps."""
    import jax.numpy as jnp

    from vae_channel_dynamics_tpu.tracking.monitor import (
        ActivityMonitor,
        MapSummary,
    )

    def build(max_hist):
        return ActivityMonitor(
            {
                "enabled": True,
                "track_interval": 1,
                "max_map_history": max_hist,
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

    rng = np.random.default_rng(0)
    maps = {
        step: rng.uniform(-1, 1, (2, 4, 4, 3)).astype(np.float32)
        for step in (1, 2, 3)
    }

    def feed(monitor):
        for step, arr in maps.items():
            acc = {
                "encoder.conv_in.output.mean_abs_activation_per_channel":
                    jnp.asarray(np.abs(arr).mean((0, 1, 2))),
            }
            monitor.step(
                step, acc, jnp.asarray(1.0),
                {"encoder.conv_in.output.full_activation_map":
                    jnp.asarray(arr)},
            )

    bounded = build(1)
    feed(bounded)
    unbounded = build(0)
    feed(unbounded)

    # old steps hold summaries, the newest keeps its real map
    assert isinstance(
        bounded.get_data_for_step(1)["vae.encoder.conv_in.output"][
            "full_activation_map"
        ],
        MapSummary,
    )
    assert isinstance(
        bounded.get_data_for_step(3)["vae.encoder.conv_in.output"][
            "full_activation_map"
        ],
        np.ndarray,
    )
    # CSV export is identical with and without eviction
    rec_b = bounded.export_all_processed_data_to_records()
    rec_u = unbounded.export_all_processed_data_to_records()
    assert len(rec_b) == len(rec_u)
    for a, b in zip(rec_b, rec_u):
        assert a.keys() == b.keys()
        for k in a:
            if isinstance(a[k], float):
                np.testing.assert_allclose(a[k], b[k], rtol=1e-6)
            else:
                assert a[k] == b[k], (k, a, b)


def test_map_history_bound_keeps_host_rss_flat():
    """Soak-scale memory proof (VERDICT round-2 item 8): feeding the
    monitor 150 intervals of 2 MB full activation maps, host RSS stays
    flat with tracking.max_map_history set, while the keep-all default
    (reference parity) grows by roughly intervals x map size. This is the
    mechanism configs/soak_cpu.yaml enables for long map-tracking runs."""
    import gc

    import jax.numpy as jnp

    from vae_channel_dynamics_tpu.tracking.monitor import ActivityMonitor

    page = os.sysconf("SC_PAGE_SIZE")

    def rss_mb():
        gc.collect()
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * page / 1e6

    def build(max_hist):
        return ActivityMonitor(
            {
                "enabled": True,
                "track_interval": 1,
                "max_map_history": max_hist,
                "target_layers": [
                    {
                        "name": "vae.encoder.conv_in",
                        "capture_point": "output",
                        "metrics": ["full_activation_map"],
                    }
                ],
            }
        )

    n_intervals = 150
    shape = (8, 64, 64, 16)  # 2 MB fp32 per interval
    map_mb = np.prod(shape) * 4 / 1e6

    def soak(monitor):
        rng = np.random.default_rng(1)
        start = rss_mb()
        for step in range(1, n_intervals + 1):
            arr = rng.uniform(-1, 1, shape).astype(np.float32)
            monitor.step(
                step, {}, jnp.asarray(0.0),
                {"encoder.conv_in.output.full_activation_map":
                    jnp.asarray(arr)},
            )
        return rss_mb() - start

    def retained_map_mb(monitor):
        from vae_channel_dynamics_tpu.tracking.monitor import MapSummary

        total = 0
        for data in monitor.processed_data_by_step.values():
            for metrics in data.values():
                value = metrics.get("full_activation_map")
                if value is not None and not isinstance(value, MapSummary):
                    total += np.asarray(value).nbytes
        return total / 1e6

    bounded = build(3)
    bounded_growth = soak(bounded)
    unbounded = build(0)
    unbounded_growth = soak(unbounded)

    # keep-all really retains every interval's map (the hazard the bound
    # fixes); count retained bytes directly — RSS undercounts under memory
    # pressure (pages swap out), which made an RSS-based control flaky.
    assert retained_map_mb(unbounded) > 0.9 * n_intervals * map_mb
    assert retained_map_mb(bounded) <= 3 * map_mb
    # the bound caps growth to a few maps' worth regardless of run length
    assert bounded_growth < 15 * map_mb, (
        f"bounded soak grew {bounded_growth:.0f} MB "
        f"(unbounded control: {unbounded_growth:.0f} MB)"
    )


# --------------------------------------------------------------------------- #
# Pad-row masking of the stat taps (ops/stats.tap_mask)
# --------------------------------------------------------------------------- #
def test_tap_stats_ignore_padded_rows():
    """The trainer pads remainder batches by DUPLICATING the last sample
    (parallel/mesh.pad_batch_to_multiple); the reference never pads, so its
    hook stats are means over the real samples only. With the step's mask
    installed via ops.stats.tap_mask, every scalar metric must equal the
    unpadded reference value — the duplicates carry zero weight."""
    from vae_channel_dynamics_tpu.ops import stats as S

    rng = np.random.default_rng(0)
    valid = rng.normal(size=(3, 4, 4, 8)).astype(np.float32)
    pad = np.repeat(valid[-1:], 5, axis=0)  # 5 duplicated pad rows
    padded = jnp.asarray(np.concatenate([valid, pad], axis=0))
    mask = jnp.asarray(np.array([1.0] * 3 + [0.0] * 5, np.float32))
    metrics = (
        "mean_abs_activation_per_channel",
        "mean_activation",
        "std_activation",
        "zero_fraction_per_channel",
    )

    reference = S.channel_stats(jnp.asarray(valid), metrics)
    with S.tap_mask(mask):
        masked = S.channel_stats(padded, metrics)
    unmasked = S.channel_stats(padded, metrics)

    for name in metrics:
        np.testing.assert_allclose(
            np.asarray(masked[name]), np.asarray(reference[name]),
            rtol=2e-6, atol=2e-6, err_msg=name,
        )
    # sanity: without the mask the duplicates DO skew the per-channel mean
    assert not np.allclose(
        np.asarray(unmasked["mean_abs_activation_per_channel"]),
        np.asarray(reference["mean_abs_activation_per_channel"]),
        rtol=1e-3,
    )
    # the mask is trace-scoped: cleared on exit
    assert S._TAP_MASK is None


def test_train_step_stats_match_unpadded_batch():
    """End-to-end through the jitted train step: the stats accumulated from
    a padded remainder batch equal those from the unpadded batch (same
    params, same RNG), while the padded forward still runs at the static
    padded shape."""
    import optax

    from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
    from vae_channel_dynamics_tpu.training import TrainState, make_train_step

    capture = (
        (
            "encoder.conv_in",
            "output",
            ("mean_abs_activation_per_channel", "std_activation"),
        ),
    )
    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg, capture=capture)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    x_valid = np.random.default_rng(1).normal(size=(2, 16, 16, 3)).astype(
        np.float32
    )
    params = module.init(rngs, jnp.asarray(x_valid), sample_posterior=True)[
        "params"
    ]
    tx = optax.sgd(0.0)  # lr 0: params unchanged, isolates the stats
    step = make_train_step(module, tx, kl_weight=1e-6, donate=False)

    def run(batch_np, mask_np):
        state = TrainState.create(
            params, tx,
            stats_acc={
                "encoder.conv_in.output.mean_abs_activation_per_channel":
                    jnp.zeros(cfg.block_out_channels[0]),
                "encoder.conv_in.output.std_activation": jnp.zeros(()),
            },
        )
        new_state, _, _ = step(
            state, {"pixel_values": jnp.asarray(batch_np)},
            jnp.asarray(mask_np), jax.random.PRNGKey(7),
        )
        return jax.device_get(new_state.stats_acc)

    padded = np.concatenate([x_valid, np.repeat(x_valid[-1:], 2, axis=0)])
    acc_padded = run(padded, np.array([1, 1, 0, 0], np.float32))
    acc_exact = run(x_valid, np.array([1, 1], np.float32))
    for k in acc_exact:
        np.testing.assert_allclose(
            acc_padded[k], acc_exact[k], rtol=3e-6, atol=3e-6, err_msg=k
        )
