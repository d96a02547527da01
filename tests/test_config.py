"""Config-loader semantics: single-level defaults inheritance, shallow merge."""

import os

import pytest
import yaml

from vae_channel_dynamics_tpu.utils.config_utils import as_float, as_int, load_config


def _write(path, data):
    with open(path, "w") as f:
        yaml.safe_dump(data, f)


def test_defaults_inheritance_shallow_merge(tmp_path):
    base = {
        "project_name": "p",
        "data": {"dataset_name": "base_ds", "resolution": 128, "batch_size": 4},
        "training": {"learning_rate": 1e-4},
    }
    exp = {
        "defaults": ["my_base"],
        "run_name": "exp",
        # nested dicts REPLACE the base's wholesale — batch_size must vanish
        "data": {"resolution": 256},
    }
    _write(tmp_path / "my_base.yaml", base)
    _write(tmp_path / "exp.yaml", exp)

    cfg = load_config(str(tmp_path / "exp.yaml"))
    assert cfg["project_name"] == "p"
    assert cfg["run_name"] == "exp"
    assert cfg["data"] == {"resolution": 256}  # shallow replace, not deep merge
    assert cfg["training"] == {"learning_rate": 1e-4}
    assert "defaults" not in cfg


def test_missing_config_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_config(str(tmp_path / "nope.yaml"))


def test_missing_base_raises(tmp_path):
    _write(tmp_path / "exp.yaml", {"defaults": ["ghost"], "a": 1})
    with pytest.raises(FileNotFoundError):
        load_config(str(tmp_path / "exp.yaml"))


def test_empty_config_ok(tmp_path):
    (tmp_path / "empty.yaml").write_text("")
    assert load_config(str(tmp_path / "empty.yaml")) == {}


def test_reference_configs_parse(reference_configs_dir):
    """All ten reference experiment YAMLs must load under our semantics."""
    names = sorted(
        n for n in os.listdir(reference_configs_dir) if n.endswith(".yaml")
    )
    assert len(names) >= 10
    for name in names:
        cfg = load_config(os.path.join(reference_configs_dir, name))
        assert isinstance(cfg, dict) and cfg


def test_reference_cifar10_test_effective_values(reference_configs_dir):
    cfg = load_config(os.path.join(reference_configs_dir, "experiment_cifar10_test.yaml"))
    assert cfg["data"]["resolution"] == 64
    assert cfg["data"]["max_samples"] == 100
    # learning_rate arrives as a string in this YAML; coercion must handle it
    assert as_float(cfg["training"]["learning_rate"], 0.0) == pytest.approx(5e-5)
    assert as_float(cfg["training"]["kl_weight"], 0.0) == pytest.approx(1e-6)
    # top-level dead-weight threshold (quirk §5a-2: NOT dead_neuron_tracking.threshold)
    assert as_float(cfg.get("threshold"), 1e-8) == pytest.approx(1e-3)
    assert cfg["intervention"]["strategy"] == "gentle_nudge_groupnorm_scale"
    assert as_int(cfg["intervention"]["intervention_interval"], 0) == 20
    # shallow merge: experiment "saving" section replaces the base's, so the
    # base's dead "save_interval" key is gone and save_interval_steps is 50
    assert "save_interval" not in cfg["saving"]
    assert cfg["saving"]["save_interval_steps"] == 50


def test_reference_nudge_config_quirk_threshold(reference_configs_dir):
    """experiment_cifar10_nudge.yaml sets dead_neuron_tracking.threshold but
    no top-level threshold — reference train.py reads only the top level
    (quirk §5a-2), so the default must win."""
    cfg = load_config(
        os.path.join(reference_configs_dir, "experiment_cifar10_nudge.yaml")
    )
    assert "threshold" not in cfg or isinstance(cfg.get("threshold"), (int, float, str))


def test_warn_unknown_keys(caplog):
    import logging as _logging

    from vae_channel_dynamics_tpu.utils.config_utils import warn_unknown_keys

    config = {
        "run_name": "x",
        "data": {"dataset_name": "a", "trasfer_dtype": "uint8"},  # typo
        "trainign": {"learning_rate": 1},  # typo'd section
        "notes": "free-form notes are known",
        "training": {"learning_rate": 1e-4},
    }
    with caplog.at_level(_logging.WARNING):
        unknown = warn_unknown_keys(config)
    assert sorted(unknown) == ["data.trasfer_dtype", "trainign"]
    assert "trasfer_dtype" in caplog.text

    # all reference configs pass clean (no false positives)
    import glob

    from vae_channel_dynamics_tpu.utils.config_utils import load_config

    for path in glob.glob("/root/reference/configs/*.yaml"):
        assert warn_unknown_keys(load_config(path)) == [], path
    for path in glob.glob("configs/*.yaml"):
        assert warn_unknown_keys(load_config(path)) == [], path


def test_known_keys_cover_documented_extensions():
    """Every framework extension key must be in the warn schema (a warning
    on our own documented keys would be a bug — caught live with ema_decay)."""
    from vae_channel_dynamics_tpu.utils.config_utils import warn_unknown_keys

    config = {
        "model": {"kernel_impl": "auto", "remat": "conv", "init_seed": 1,
                  "architecture": "sdxl"},
        "data": {"transfer_dtype": "uint8", "streaming": True},
        "training": {"ema_decay": 0.999, "abort_on_nonfinite": False},
        "saving": {"keep_last_n": 3, "async_save": True},
        "tracking": {"max_map_history": 2},
        "parallel": {"spatial": 2, "tensor": 2},
        "profiling": {"enabled": True},
    }
    assert warn_unknown_keys(config) == []
