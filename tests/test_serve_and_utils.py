"""Serving CLI e2e + reporting/plotting/checkpoint utility coverage."""

import json
import os

import numpy as np
import pytest

from vae_channel_dynamics_tpu.models import SDXLVAEWrapper, VAEConfig
from vae_channel_dynamics_tpu.models import io as model_io


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt")
    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=2)
    model_io.save_model_dir(str(path / "vae"), wrapper.config, wrapper.params)
    return path


def test_serve_reconstruct(ckpt_dir, tmp_path):
    from vae_channel_dynamics_tpu import serve

    out = tmp_path / "recon"
    rc = serve.main(
        [
            "--checkpoint_path", str(ckpt_dir),
            "--input", "synthetic://shapes?num_samples=6",
            "--output", str(out),
            "--resolution", "32",
            "--batch_size", "4",
        ]
    )
    assert rc == 0
    pngs = sorted(out.glob("recon_*.png"))
    assert len(pngs) == 6
    metrics = json.loads((out / "serve_metrics.json").read_text())
    assert metrics["num_images"] == 6
    assert np.isfinite(metrics["avg_mse"])


def test_serve_encode_then_decode(ckpt_dir, tmp_path):
    from vae_channel_dynamics_tpu import serve

    enc_out = tmp_path / "latents"
    rc = serve.main(
        [
            "--checkpoint_path", str(ckpt_dir),
            "--input", "synthetic://gradients?num_samples=4",
            "--output", str(enc_out),
            "--mode", "encode",
            "--resolution", "32",
            "--batch_size", "4",
        ]
    )
    assert rc == 0
    latent_files = sorted(enc_out.glob("latents_*.npy"))
    assert latent_files
    z = np.load(latent_files[0])
    assert z.shape == (4, 16, 16, 4)  # 32px/2 downsample, 4 channels

    dec_out = tmp_path / "decoded"
    rc = serve.main(
        [
            "--checkpoint_path", str(ckpt_dir),
            "--input", str(latent_files[0]),
            "--output", str(dec_out),
            "--mode", "decode",
            "--batch_size", "2",
        ]
    )
    assert rc == 0
    assert len(list(dec_out.glob("decoded_*.png"))) == 4


def test_reporters(tmp_path):
    from vae_channel_dynamics_tpu.utils.reporting import build_reporter

    # wandb is not installed here -> must degrade to JSONL, not crash
    r = build_reporter(
        "wandb", str(tmp_path), str(tmp_path / "logs"), "p", "r",
        config={"a": 1},
    )
    r.log({"loss": 1.5, "note": "x"}, step=3)
    r.finish()
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    rec = json.loads(lines[0])
    assert rec["step"] == 3 and rec["loss"] == 1.5

    # tensorboard adapter writes event files
    r2 = build_reporter("tensorboard", str(tmp_path), str(tmp_path / "tb"), "p", "r")
    r2.log({"loss": 1.0}, 1)
    r2.finish()
    assert any(f.startswith("events") for f in os.listdir(tmp_path / "tb"))

    # non-main process logs nothing
    r3 = build_reporter(
        "wandb", str(tmp_path / "x"), str(tmp_path / "x"), "p", "r",
        is_main_process=False,
    )
    r3.log({"loss": 1.0}, 1)
    assert not (tmp_path / "x").exists()


def test_plotters_produce_files(tmp_path):
    from vae_channel_dynamics_tpu.utils.plotting import (
        ActivityPlotter,
        DeadNeuronPlotter,
        plot_dead_vs_nudge,
    )

    plotter = DeadNeuronPlotter(top_n_layers=3, threshold=1e-5,
                                output_dir=str(tmp_path))
    plotter.plot_all(
        percent_history={
            "layer1.weight": [(0, 1.0), (10, 0.5)],
            "gn1.weight": [(0, 100.0), (10, 25.0)],
        },
        weights_history={
            "conv.weight": [np.random.default_rng(0).random((8, 3, 3, 3))],
            "fc.weight": [np.random.default_rng(0).random((8, 4))],
        },
    )
    assert (tmp_path / "dead_neuron_percentage_history.png").exists()
    assert (tmp_path / "dead_neuron_percentage_history.csv").exists()
    assert (tmp_path / "filter_magnitudes_conv_weight.png").exists()
    assert (tmp_path / "heatmap_fc_weight.png").exists()

    # activity plot from a CSV in the monitor's record schema
    import pandas as pd

    records = [
        {
            "global_step": s,
            "layer_identifier": "vae.x.output",
            "original_metric_name": "mean_abs_activation_per_channel",
            "metric_type": "per_channel_overall_mean",
            "metric_value": 1.0 / (s + 1),
        }
        for s in (1, 2, 3)
    ]
    csv = tmp_path / "stats.csv"
    pd.DataFrame(records).to_csv(csv, index=False)
    ActivityPlotter(str(tmp_path / "act")).plot_activation_stats_evolution(str(csv))
    assert list((tmp_path / "act").glob("*.png"))

    hist = tmp_path / "intervention_history.csv"
    hist.write_text("10,5,5\n20,3,3\n")
    plot_dead_vs_nudge(str(hist), str(tmp_path / "dvn.png"), 1.1)
    assert (tmp_path / "dvn.png").exists()


def test_latest_checkpoint(tmp_path):
    from vae_channel_dynamics_tpu.training.checkpoint import latest_checkpoint

    assert latest_checkpoint(str(tmp_path)) is None
    for step in (5, 20, 100):
        os.makedirs(tmp_path / f"chkpt-{step}" / "state")
    os.makedirs(tmp_path / "chkpt-999")  # no state subdir -> ignored
    assert latest_checkpoint(str(tmp_path)) == str(tmp_path / "chkpt-100")


def test_prune_checkpoints(tmp_path):
    from vae_channel_dynamics_tpu.training.checkpoint import prune_checkpoints

    for step in (10, 20, 30, 40):
        os.makedirs(tmp_path / f"chkpt-{step}" / "state")
    prune_checkpoints(str(tmp_path), "chkpt", keep_last_n=0)  # parity: keep all
    assert len(list(tmp_path.glob("chkpt-*"))) == 4
    prune_checkpoints(str(tmp_path), "chkpt", keep_last_n=2)
    remaining = sorted(p.name for p in tmp_path.glob("chkpt-*"))
    assert remaining == ["chkpt-30", "chkpt-40"]


def test_doctor_cli(monkeypatch):
    """The environment self-check runs clean in the test environment."""
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.setenv("VCD_DATA_FALLBACK", "synthetic")
    from vae_channel_dynamics_tpu.tools import doctor

    doctor._RESULTS.clear()
    rc = doctor.main(["--no-device"])
    assert rc == 0
    assert "FAIL" not in doctor._RESULTS


def test_serving_bench_tool_against_live_server():
    """tools/serving_bench drives a live daemon end to end: ok req/s,
    percentiles, and /stats deltas, with 503s retried after Retry-After."""
    import json as _json
    import subprocess
    import sys
    import threading

    from vae_channel_dynamics_tpu.models import SDXLVAEWrapper, VAEConfig
    from vae_channel_dynamics_tpu.server import VAEServer

    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=0)
    srv = VAEServer(wrapper, resolution=32, max_batch=4, max_wait_ms=5.0,
                    port=0, max_queue=4)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        proc = subprocess.run(
            [sys.executable, "-m",
             "vae_channel_dynamics_tpu.tools.serving_bench",
             "--url", f"http://127.0.0.1:{srv.port}",
             "--streams", "8", "--duration_s", "4", "--resolution", "32"],
            capture_output=True, text=True, timeout=300,
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        assert lines, proc.stdout + proc.stderr
        result = _json.loads(lines[-1])
        assert result["ok"] > 0
        assert result["errors"] == 0, result
        assert result["latency_ms_p50"] is not None
        assert result["server_batch_calls"] > 0
        assert proc.returncode == 0
    finally:
        srv.shutdown()


def test_pyproject_entry_points_resolve():
    """Packaging contract: every console script in pyproject.toml points at
    an importable callable, and the version matches the package's."""
    import importlib
    import tomllib

    import vae_channel_dynamics_tpu as pkg

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        cfg = tomllib.load(f)
    assert cfg["project"]["version"] == pkg.__version__
    for target in cfg["project"]["scripts"].values():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn)), target
