"""End-to-end CLI smoke of parallel.spatial_conv: shard_map.

tests/test_spatial_conv.py pins op- and step-level parity; this module
pins the TRAINER wiring: configs/smoke_spatial_tensor.yaml runs the real
train CLI on a data x spatial x tensor (2x2x2) mesh with manual halo
convs and ZeRO-1/3 — the composition make_mesh refuses under the default
GSPMD partitioner — asserting exit 0, the artifact tree, a finite final
loss, and that the intervention subsystem fired through the
distributed-at-compute params.

Subprocess + file-backed stdout per CLAUDE.md (undrained PIPEs deadlock
on this box).
"""

import json
import os
import subprocess
import sys

import pytest
import yaml

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_smoke_spatial_tensor_cli(tmp_path):
    with open(os.path.join(_REPO, "configs", "smoke_spatial_tensor.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["output_dir"] = str(tmp_path / "results")
    cfg_path = tmp_path / "smoke_spatial_tensor.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    out = tmp_path / "cli.log"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    with open(out, "w") as f:
        rc = subprocess.call(
            [
                sys.executable, "-m", "vae_channel_dynamics_tpu.train",
                "--config_path", str(cfg_path),
            ],
            stdout=f, stderr=subprocess.STDOUT, env=env, cwd=_REPO,
            timeout=900,
        )
    log = out.read_text()
    assert rc == 0, log[-3000:]
    assert "parallel.spatial_conv: shard_map" in log, log[-3000:]
    assert "parameter buffers sharded" in log, log[-3000:]
    # shard_map mode must NOT take the gspmd re-replication path
    assert "re-replicate the sharded params" not in log
    run_dir = tmp_path / "results" / "smoke_spatial_tensor"
    for name in (
        "config.yaml",
        "tracked_activation_stats.csv",
        "intervention_history.csv",
        "final_model",
        "metrics.jsonl",
    ):
        assert (run_dir / name).exists(), (name, sorted(
            p.name for p in run_dir.iterdir()
        ))
    losses = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
        if "train_loss_step" in line
    ]
    assert losses, "no train_loss_step records in metrics.jsonl"
    import math

    final = [r for r in losses if "train_loss_step" in r][-1]
    assert math.isfinite(float(final["train_loss_step"])), final
