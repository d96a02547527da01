"""Dataset-level golden eval parity (the offline answer to paper Table 1).

Runs the REAL ``evaluate`` CLI — checkpoint loading through the diffusers
converter, the image-folder data pipeline, the jitted sharded eval step on
the 8-device CPU mesh, metric accumulation, artifact writing — over the
committed 48-image fixture and the committed torch-seeded checkpoint, and
asserts its dataset-level MSE / KL / PSNR / SSIM equal BOTH:

  * the float64 torch oracle recomputed live (same accumulation semantics
    as the reference, src/evaluate.py:220-328), and
  * the committed golden_metrics.json (drift guard across rounds).

Together with the byte-exact weight-import test this proves the eval stack
would reproduce the reference's published numbers given the real datasets
(which this environment cannot fetch — no network egress).
"""

import json
import os

import numpy as np
import pytest

from golden_eval_harness import (
    BATCH_SIZE,
    CKPT_DIR,
    GOLDEN_JSON,
    IMAGES_DIR,
    NUM_IMAGES,
    RESOLUTION,
    build_torch_model,
    load_images_minus1_1,
    torch_oracle,
)
from vae_channel_dynamics_tpu.tools.convert_diffusers import convert


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_JSON) as f:
        return json.load(f)


def test_live_torch_oracle_matches_committed_golden(golden):
    """The committed golden file IS the oracle's output (regeneration
    guard: a torch-version or fixture drift shows up here, loudly)."""
    live = torch_oracle(build_torch_model(), load_images_minus1_1())
    assert live["num_samples"] == golden["num_samples"] == NUM_IMAGES
    for key in ("mse", "kl", "psnr", "ssim"):
        np.testing.assert_allclose(
            live[key], golden[key], rtol=1e-9, err_msg=key
        )


def test_evaluate_cli_matches_golden_dataset_metrics(tmp_path, golden):
    model_dir = tmp_path / "model"
    convert(CKPT_DIR, str(model_dir))

    config_path = tmp_path / "eval_config.yaml"
    config_path.write_text(
        "seed: 0\n"
        "data:\n"
        f"  dataset_name: {IMAGES_DIR}\n"
        f"  resolution: {RESOLUTION}\n"
        f"  batch_size: {BATCH_SIZE}\n"
        "training:\n"
        "  mixed_precision: 'no'\n"
    )
    out_dir = tmp_path / "eval_out"
    from vae_channel_dynamics_tpu.evaluate import main as evaluate_main

    rc = evaluate_main([
        "--config_path", str(config_path),
        "--checkpoint_path", str(model_dir),
        "--eval_split", "test",
        "--output_dir", str(out_dir),
        "--batch_size", str(BATCH_SIZE),
        "--num_samples_to_save", "2",
        "--enable_logit_lens", "false",
    ])
    assert rc == 0
    with open(out_dir / "eval_metrics.json") as f:
        ours = json.load(f)

    assert ours["num_samples"] == NUM_IMAGES
    # fp32 model vs float64 oracle at dataset granularity: the only
    # admissible difference is compute precision. Measured agreement
    # (BASELINE.md): MSE 2.1e-8, KL 5.6e-6, PSNR 1.0e-7, SSIM 1.5e-6
    # relative; bounds below keep ~5x margin for platform variation.
    np.testing.assert_allclose(ours["mse"], golden["mse"], rtol=1e-6)
    np.testing.assert_allclose(ours["kl"], golden["kl"], rtol=3e-5)
    assert abs(ours["psnr"] - golden["psnr"]) < 1e-4  # dB
    assert abs(ours["ssim"] - golden["ssim"]) < 1e-5
    # the txt twin exists with the same numbers (reference artifact parity)
    txt = (out_dir / "eval_metrics.txt").read_text()
    assert f"Number of Samples Processed: {NUM_IMAGES}" in txt
