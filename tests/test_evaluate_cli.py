"""Evaluate CLI end-to-end (in-process) against a freshly saved checkpoint."""

import os

import yaml

from vae_channel_dynamics_tpu import evaluate as evaluate_cli
from vae_channel_dynamics_tpu.models import SDXLVAEWrapper, VAEConfig
from vae_channel_dynamics_tpu.models import io as model_io


def test_evaluate_cli_end_to_end(tmp_path):
    # checkpoint dir with a vae/ subdir (the train-CLI artifact contract)
    ckpt = tmp_path / "final_model"
    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=1)
    model_io.save_model_dir(str(ckpt / "vae"), wrapper.config, wrapper.params)

    config = {
        "seed": 0,
        "data": {
            "dataset_name": "synthetic://shapes",
            "resolution": 32,
            "batch_size": 4,
            "validation_split_name": "test",
            "validation_max_samples": 8,
            "validation_batch_size": 4,
            "num_workers": 0,
        },
        "training": {"mixed_precision": "no"},
        "logit_lens": {"num_channels_to_viz": 2},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(config))

    rc = evaluate_cli.main(
        [
            "--config_path", str(cfg_path),
            "--checkpoint_path", str(ckpt),
            "--eval_split", "test",
            "--num_samples_to_save", "2",
            "--logit_lens_layers", "encoder.down_blocks.0.resnets.0.norm1",
        ]
    )
    assert rc == 0
    # the CLI installs the flash-attention shard mesh for its own traces
    # (8 virtual devices under the test conftest) and must restore the
    # global on exit — a leaked mesh bakes a wrong shard_map decision into
    # any later in-process trace (this bit tests/test_flash_attention.py)
    from vae_channel_dynamics_tpu.ops import pallas_attention

    assert pallas_attention._SHARD_MESH is None
    outdir = ckpt / "eval_results_test"
    metrics = (outdir / "eval_metrics.txt").read_text()
    assert "Average MSE:" in metrics
    assert "Average PSNR:" in metrics
    assert "Average SSIM:" in metrics
    assert "Number of Samples Processed: 8" in metrics
    assert (outdir / "sample_0_orig.png").exists()
    assert (outdir / "sample_0_recon.png").exists()
    assert (outdir / "sample_1_recon.png").exists()
    assert (outdir / "out_0.png").exists()  # activation grid
    # logit lens projections
    ll_dirs = list((outdir / "logit_lens_visualizations_eval").rglob("*.png"))
    assert ll_dirs
    # sanity: metrics are finite numbers
    for line in metrics.splitlines():
        if line.startswith("Average"):
            val = float(line.split(":")[1])
            assert val == val  # not NaN


def test_evaluate_cli_mesh_matches_single_device(tmp_path, monkeypatch):
    """Sharded eval (8-device mesh) must produce the same metrics as a
    1-device run — the eval_batch in_shardings split work without changing
    the math (VERDICT round-1 item 6)."""
    import vae_channel_dynamics_tpu.parallel as parallel_pkg
    from vae_channel_dynamics_tpu.parallel.mesh import make_mesh

    ckpt = tmp_path / "final_model"
    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=3)
    model_io.save_model_dir(str(ckpt / "vae"), wrapper.config, wrapper.params)

    config = {
        "seed": 0,
        "data": {
            "dataset_name": "synthetic://gradients",
            "resolution": 32,
            "batch_size": 4,
            "validation_split_name": "test",
            "validation_max_samples": 16,
            "validation_batch_size": 4,
            "num_workers": 0,
        },
        "training": {"mixed_precision": "no"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(config))

    def run(n_devices, out):
        monkeypatch.setattr(
            parallel_pkg, "make_mesh", lambda **kw: make_mesh(n_devices=n_devices)
        )
        rc = evaluate_cli.main(
            [
                "--config_path", str(cfg_path),
                "--checkpoint_path", str(ckpt),
                "--eval_split", "test",
                "--output_dir", str(out),
                "--num_samples_to_save", "0",
                "--enable_logit_lens", "false",
            ]
        )
        assert rc == 0
        metrics = {}
        for line in (out / "eval_metrics.txt").read_text().splitlines():
            if line.startswith("Average"):
                key, val = line.split(":")
                metrics[key] = float(val)
        return metrics

    single = run(1, tmp_path / "eval_1dev")
    meshed = run(8, tmp_path / "eval_8dev")
    assert single.keys() == meshed.keys()
    for key in single:
        assert abs(single[key] - meshed[key]) <= 1e-4 * max(
            1.0, abs(single[key])
        ), f"{key}: {single[key]} vs {meshed[key]}"


def test_evaluate_cli_uint8_transfer_matches_float(tmp_path):
    """data.transfer_dtype: uint8 must change neither the metrics (beyond
    float noise) nor break the PNG/logit-lens paths, because eval batches
    dequantize on device and PNG saving dequantizes on host."""
    import numpy as np

    ckpt = tmp_path / "final_model"
    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=1)
    model_io.save_model_dir(str(ckpt / "vae"), wrapper.config, wrapper.params)

    def run(transfer_dtype, out_split):
        config = {
            "seed": 0,
            "data": {
                "dataset_name": "synthetic://shapes",
                "resolution": 32,
                "batch_size": 4,
                "validation_split_name": out_split,
                "validation_max_samples": 8,
                "validation_batch_size": 4,
                "transfer_dtype": transfer_dtype,
            },
            "training": {"mixed_precision": "no"},
        }
        cfg_path = tmp_path / f"cfg_{transfer_dtype}.yaml"
        cfg_path.write_text(yaml.safe_dump(config))
        rc = evaluate_cli.main(
            [
                "--config_path", str(cfg_path),
                "--checkpoint_path", str(ckpt),
                "--eval_split", out_split,
                "--num_samples_to_save", "1",
            ]
        )
        assert rc == 0
        outdir = ckpt / f"eval_results_{out_split}"
        metrics = {}
        for line in (outdir / "eval_metrics.txt").read_text().splitlines():
            if line.startswith("Average"):
                key, val = line.split(":")
                metrics[key.strip()] = float(val)
        # orig PNG must not be saturated garbage (the uint8 bug symptom was
        # an all-white image)
        from PIL import Image

        orig = np.asarray(Image.open(outdir / "sample_0_orig.png"))
        assert orig.std() > 1.0
        return metrics

    m_f32 = run("float32", "test")
    m_u8 = run("uint8", "test")  # same split -> same images
    # uint8 quantizes the INPUT pixels (the reference pipeline's own
    # quantization), so metrics differ only at the quantization level
    assert abs(m_f32["Average MSE"] - m_u8["Average MSE"]) < 5e-4, (m_f32, m_u8)
    assert abs(m_f32["Average PSNR"] - m_u8["Average PSNR"]) < 0.5


def test_max_eval_samples_flag(tmp_path):
    ckpt = tmp_path / "final_model"
    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=1)
    model_io.save_model_dir(str(ckpt / "vae"), wrapper.config, wrapper.params)
    config = {
        "seed": 0,
        "data": {
            "dataset_name": "synthetic://shapes",
            "resolution": 32,
            "batch_size": 4,
            "validation_split_name": "test",
            "validation_max_samples": 64,
        },
        "training": {"mixed_precision": "no"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    rc = evaluate_cli.main(
        [
            "--config_path", str(cfg_path),
            "--checkpoint_path", str(ckpt),
            "--eval_split", "test",
            "--max_eval_samples", "8",
            "--num_samples_to_save", "0",
            "--enable_logit_lens", "false",
        ]
    )
    assert rc == 0
    metrics = (ckpt / "eval_results_test" / "eval_metrics.txt").read_text()
    assert "Number of Samples Processed: 8" in metrics
