"""Smoke tests for the run-report and run-comparison tools over synthesized
run artifacts (the artifact schema the trainer writes)."""

import json
import os

import pandas as pd
import pytest


def _make_run_dir(root, name, loss0=0.5):
    run = root / name
    run.mkdir(parents=True)
    with open(run / "metrics.jsonl", "w") as f:
        for step in range(1, 21):
            f.write(json.dumps({
                "step": step,
                "train_loss_step": loss0 / step,
                "rec_loss": loss0 / step * 0.9,
                "kl_loss": loss0 / step * 0.1,
                "grad_norm": 1.0,
                "lr": 1e-4,
            }) + "\n")
    with open(run / "intervention_history.csv", "a") as f:
        f.write("10,5,5\n20,3,3\n")
    pd.DataFrame([
        {
            "global_step": s,
            "layer_identifier": "vae.encoder.conv_in.output",
            "original_metric_name": "mean_abs_activation_per_channel",
            "metric_type": "per_channel_overall_mean",
            "metric_value": 0.2 + 0.01 * s,
        }
        for s in (10, 20)
    ]).to_csv(run / "tracked_activation_stats.csv", index=False)
    pd.DataFrame([
        {"step": 10, "layer": "vae.encoder.conv_in.weight", "percentage": 1.0},
        {"step": 20, "layer": "vae.encoder.conv_in.weight", "percentage": 2.0},
    ]).to_csv(run / "dead_neuron_percentage_history.csv", index=False)
    eval_dir = run / "final_model" / "eval_results_test"
    eval_dir.mkdir(parents=True)
    (eval_dir / "eval_metrics.txt").write_text(
        "Evaluation Split: test\nNumber of Samples Processed: 8\n"
        "Average MSE: 0.01\nAverage KL: 100.0\n"
        "Average PSNR: 25.0\nAverage SSIM: 0.9\n"
    )
    return run


def test_report_tool(tmp_path):
    from vae_channel_dynamics_tpu.tools import report

    run = _make_run_dir(tmp_path, "run_a")
    rc = report.main(["--run_dir", str(run)])
    assert rc == 0
    text = (run / "report.md").read_text()
    assert "train_loss_step" in text or "loss" in text.lower()
    assert "25.0" in text or "PSNR" in text


def test_compare_runs_tool(tmp_path):
    from vae_channel_dynamics_tpu.tools import compare_runs

    base = _make_run_dir(tmp_path, "base", loss0=0.5)
    treat = _make_run_dir(tmp_path, "treat", loss0=0.4)
    out = tmp_path / "comparison.md"
    rc = compare_runs.main([
        "--baseline", str(base), "--treatment", str(treat),
        "--output", str(out),
    ])
    assert rc == 0
    text = out.read_text()
    assert "base" in text and "treat" in text
