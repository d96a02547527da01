"""WandbReporter call-contract coverage via an injected fake ``wandb``
module (VERDICT round-2 item 5).

wandb is not installed in this environment, so the live adapter path was
dead code at test time — every other test exercises the JSONL fallback.
Here a stub module in ``sys.modules`` records init/log/Artifact/
log_artifact/finish calls, proving the adapter drives the same API
surface as the reference (src/train.py:138-144 init, :331-338 per-step
logs with ``tracking/...`` keys, :427-432 sanitized
``{run_name}_activations`` dataset Artifact, :464 finish).
"""

import sys
import types

import numpy as np
import pytest


class _FakeArtifact:
    def __init__(self, name, type):  # noqa: A002 — wandb's own kwarg name
        self.name = name
        self.type = type
        self.files = []

    def add_file(self, path):
        self.files.append(path)


def _install_fake_wandb(monkeypatch):
    calls = {
        "init": [],
        "log": [],
        "artifacts_logged": [],
        "finish": 0,
    }
    fake = types.ModuleType("wandb")
    fake.__dict__["_calls"] = calls

    def init(**kwargs):
        calls["init"].append(kwargs)
        fake.run = types.SimpleNamespace(id="fake-run-id")
        return fake.run

    def log(metrics, step=None):
        calls["log"].append((dict(metrics), step))

    def log_artifact(artifact):
        calls["artifacts_logged"].append(artifact)

    def finish():
        calls["finish"] += 1

    fake.init = init
    fake.log = log
    fake.Artifact = _FakeArtifact
    fake.log_artifact = log_artifact
    fake.finish = finish
    fake.run = None
    monkeypatch.setitem(sys.modules, "wandb", fake)
    return calls


def test_reporter_drives_wandb_api(monkeypatch, tmp_path):
    calls = _install_fake_wandb(monkeypatch)
    from vae_channel_dynamics_tpu.utils.reporting import (
        WandbReporter,
        build_reporter,
    )

    reporter = build_reporter(
        report_to="wandb",
        output_dir=str(tmp_path),
        logging_dir=str(tmp_path / "logs"),
        project_name="proj",
        run_name="runx",
        config={"seed": 1},
        entity="team",
    )
    # with wandb importable the builder must pick the live adapter, not
    # the JSONL fallback
    assert isinstance(reporter, WandbReporter)
    assert calls["init"] == [
        {
            "project": "proj",
            "name": "runx",
            "config": {"seed": 1},
            "dir": str(tmp_path),
            "entity": "team",
        }
    ]

    reporter.log({"train_loss_step": 0.5, "lr": 1e-4}, step=3)
    assert calls["log"] == [({"train_loss_step": 0.5, "lr": 1e-4}, 3)]

    csv = tmp_path / "tracked_activation_stats.csv"
    csv.write_text("a,b\n1,2\n")
    reporter.log_artifact(str(csv), "runx_activations", artifact_type="dataset")
    (art,) = calls["artifacts_logged"]
    assert art.name == "runx_activations"
    assert art.type == "dataset"
    assert art.files == [str(csv)]

    reporter.finish()
    assert calls["finish"] == 1


def test_artifact_upload_failure_is_nonfatal(monkeypatch, tmp_path):
    calls = _install_fake_wandb(monkeypatch)
    fake = sys.modules["wandb"]

    def boom(artifact):
        raise OSError("network down")

    fake.log_artifact = boom
    from vae_channel_dynamics_tpu.utils.reporting import WandbReporter

    reporter = WandbReporter("p", "r", {}, str(tmp_path), None)
    reporter.log_artifact(str(tmp_path / "x.csv"), "n")  # must not raise
    assert calls["finish"] == 0


@pytest.mark.slow
def test_trainer_e2e_logs_reference_schema_through_wandb(monkeypatch, tmp_path):
    """A tiny all-subsystems training run with report_to: "wandb" and the
    fake installed: per-step ``tracking/...`` metric keys, intervention
    counters, the sanitized activations Artifact, and finish() all land on
    the wandb API exactly as the reference drives it."""
    calls = _install_fake_wandb(monkeypatch)
    from vae_channel_dynamics_tpu.training.loop import Trainer

    config = {
        "project_name": "proj",
        "run_name": "wandb e2e!",  # needs sanitizing for the artifact name
        "output_dir": str(tmp_path),
        "seed": 0,
        "model": {"pretrained_vae_name": None, "architecture": "tiny"},
        "data": {
            "dataset_name": "synthetic://shapes",
            "resolution": 16,
            # batch_size is per-device; under the 8-device conftest mesh the
            # global batch is 16, so 64 samples -> 4 update steps and the
            # interval-2 intervention fires twice
            "max_samples": 64,
            "batch_size": 2,
            "num_workers": 0,
            "do_validation": False,
        },
        "training": {
            "num_train_epochs": 1,
            "learning_rate": 1e-4,
            "lr_warmup_steps": 1,
            "kl_weight": 1e-6,
        },
        "logging": {"log_interval": 1, "report_to": "wandb", "entity": "team"},
        "tracking": {
            "enabled": True,
            "track_interval": 1,
            "target_layers": [
                {
                    "name": "vae.encoder.down_blocks.0.resnets.0.norm1",
                    "capture_point": "output",
                    "metrics": ["mean_abs_activation_per_channel"],
                }
            ],
        },
        "classification": {
            "enabled": True,
            "method": "threshold_groupnorm_activity",
            "threshold": 10.0,
            "target_metric_key": "mean_abs_activation_per_channel",
            "layers_to_classify": [
                "vae.encoder.down_blocks.0.resnets.0.norm1.output"
            ],
        },
        "intervention": {
            "enabled": True,
            "strategy": "gentle_nudge_groupnorm_scale",
            "nudge_factor": 1.1,
            "max_scale_value": 1.5,
            "intervention_interval": 2,
        },
    }
    Trainer(config).train()

    assert len(calls["init"]) == 1
    assert calls["init"][0]["project"] == "proj"
    assert calls["init"][0]["entity"] == "team"

    logged_keys = set()
    for metrics, _step in calls["log"]:
        logged_keys.update(metrics.keys())
    # the reference's wandb key schema (monitor.py:170-202 tracking keys
    # with overall_mean/std suffixes, train.py:323-326 intervention
    # counters, :331-338 train metrics)
    expected_tracking = (
        "tracking/vae.encoder.down_blocks.0.resnets.0.norm1.output/"
        "mean_abs_activation_per_channel_overall_mean"
    )
    assert expected_tracking in logged_keys, sorted(logged_keys)
    assert "inactive_channels" in logged_keys
    assert "nudged_scales" in logged_keys
    assert "train_loss_step" in logged_keys

    (art,) = calls["artifacts_logged"]
    assert art.name == "wandb_e2e__activations"  # sanitized
    assert art.type == "dataset"
    assert art.files and art.files[0].endswith("tracked_activation_stats.csv")
    assert calls["finish"] >= 1
