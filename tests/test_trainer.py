"""Trainer orchestration: reference-config construction, tiny e2e run,
diffusers conversion tool."""

import json

import jax
import os

import numpy as np
import pytest
import yaml

from vae_channel_dynamics_tpu.training.loop import Trainer
from vae_channel_dynamics_tpu.utils.config_utils import load_config


def test_trainer_constructs_from_all_reference_configs(reference_configs_dir):
    """Every reference experiment YAML must drive Trainer configuration
    (construction parses all sections; no data/network access happens)."""
    for name in sorted(os.listdir(reference_configs_dir)):
        if not name.endswith(".yaml") or name == "base_config.yaml":
            continue
        cfg = load_config(os.path.join(reference_configs_dir, name))
        trainer = Trainer(cfg)
        assert trainer.run_name
        assert trainer.kl_weight >= 0
        assert trainer.threshold_dn > 0


@pytest.mark.slow
def test_tiny_end_to_end_run(tmp_path):
    """Full pipeline in-process: train 4 steps on synthetic data with every
    subsystem enabled, then check the artifact tree (the pytest analog of
    the reference's experiment_cifar10_test smoke flow)."""
    config = {
        "project_name": "t",
        "run_name": "e2e",
        "output_dir": str(tmp_path),
        "seed": 0,
        "threshold": 1e-3,
        "mean_percentage": 0.1,
        "dead_type": "both",
        "model": {"pretrained_vae_name": None, "architecture": "tiny"},
        "data": {
            "dataset_name": "synthetic://shapes",
            "resolution": 16,
            "max_samples": 32,
            "batch_size": 2,
            "num_workers": 0,
            "do_validation": True,
            "validation_split_name": "test",
            "validation_max_samples": 8,
            "validation_batch_size": 4,
        },
        "training": {
            "num_train_epochs": 2,
            "learning_rate": "1e-4",
            "lr_warmup_steps": 1,
            "kl_weight": "1e-6",
            "mixed_precision": "no",
            "validation_epochs": 1,
        },
        "logging": {"log_interval": 1, "report_to": "jsonl"},
        "saving": {
            "save_interval_steps": 2,
            "checkpoint_dir_prefix": "chkpt",
            "export_stablehlo": True,
        },
        "dead_neuron_tracking": {
            "enabled": True,
            "track_interval": 1,
            "target_layer_names_for_raw_weights": ["vae.encoder.conv_in.weight"],
        },
        "tracking": {
            "enabled": True,
            "track_interval": 1,
            "target_layers": [
                {
                    "name": "vae.encoder.down_blocks.0.resnets.0.norm1",
                    "capture_point": "output",
                    "metrics": [
                        "mean_abs_activation_per_channel",
                        "full_activation_map",
                    ],
                }
            ],
        },
        "logit_lens": {
            "enabled": True,
            "visualization_interval": 2,
            "target_tracked_metrics": [
                "vae.encoder.down_blocks.0.resnets.0.norm1.output.full_activation_map"
            ],
            "num_channels_to_viz": 2,
            "run_mini_decoder_projection": True,
        },
        "classification": {
            "enabled": True,
            "method": "threshold_groupnorm_activity",
            "threshold": 10.0,  # everything inactive -> guaranteed nudge
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
    summary = Trainer(config).train()
    run_dir = tmp_path / "e2e"
    assert summary["global_step"] >= 4
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "metrics.jsonl").exists()
    assert (run_dir / "tracked_activation_stats.csv").exists()
    assert (run_dir / "intervention_history.csv").exists()
    assert (
        run_dir / "final_model" / "vae" / "diffusion_pytorch_model.safetensors"
    ).exists()
    assert (run_dir / "final_model" / "state").is_dir()
    assert (run_dir / "dead_neuron_percentage_history.csv").exists()
    # saving.export_stablehlo wrote runnable deployment artifacts
    from vae_channel_dynamics_tpu.models.io import load_model_dir
    from vae_channel_dynamics_tpu.tools.export_model import load_exported

    export_dir = run_dir / "final_model" / "exported"
    assert summary["export_dir"] == str(export_dir)
    fns = load_exported(str(export_dir))
    _, params = load_model_dir(str(run_dir / "final_model" / "vae"))
    recon = fns["reconstruct"](
        params, np.zeros((1, 16, 16, 3), np.float32)
    )
    assert recon.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(recon)))
    # intervention actually nudged scales
    rows = (run_dir / "intervention_history.csv").read_text().strip().splitlines()
    assert len(rows) >= 1
    step, inactive, nudged = rows[0].split(",")
    assert int(nudged) > 0
    # metrics jsonl has training losses
    lines = [
        json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("train_loss_step" in l for l in lines)
    assert any("validation/avg_total_loss" in l for l in lines)


def test_convert_diffusers_roundtrip(tmp_path):
    """A synthetic 'diffusers dir' (torch names/layouts) converts to our
    format and loads back with identical tensors."""
    from safetensors.numpy import save_file

    from vae_channel_dynamics_tpu.models import SDXLVAEWrapper, VAEConfig
    from vae_channel_dynamics_tpu.models import io as model_io
    from vae_channel_dynamics_tpu.tools.convert_diffusers import convert
    from vae_channel_dynamics_tpu.utils import naming

    cfg = VAEConfig.tiny()
    wrapper = SDXLVAEWrapper(config=cfg, seed=3)
    flat = model_io.flatten_params(wrapper.params)

    src = tmp_path / "diffusers"
    os.makedirs(src)
    save_file(
        {k: np.ascontiguousarray(v) for k, v in flat.items()},
        str(src / "diffusion_pytorch_model.safetensors"),
    )
    with open(src / "config.json", "w") as f:
        json.dump(
            {
                "_class_name": "AutoencoderKL",
                "block_out_channels": list(cfg.block_out_channels),
                "layers_per_block": cfg.layers_per_block,
                "latent_channels": cfg.latent_channels,
                "norm_num_groups": cfg.norm_num_groups,
                "scaling_factor": cfg.scaling_factor,
                "sample_size": cfg.sample_size,
            },
            f,
        )

    dst = tmp_path / "converted"
    convert(str(src), str(dst))
    loaded_cfg, loaded = model_io.load_model_dir(str(dst), template=wrapper.params)
    assert loaded_cfg.block_out_channels == cfg.block_out_channels
    for (n1, a), (n2, b) in zip(
        sorted(naming.iter_torch_named_params(wrapper.params)),
        sorted(naming.iter_torch_named_params(loaded)),
    ):
        assert n1 == n2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resolve_model_local_dir(tmp_path):
    """model.pretrained_vae_name pointing at a saved model dir loads its
    weights (the local-checkpoint fine-tune path)."""
    import jax.numpy as jnp

    from vae_channel_dynamics_tpu.models import SDXLVAEWrapper, VAEConfig
    from vae_channel_dynamics_tpu.models import io as model_io
    from vae_channel_dynamics_tpu.training.loop import resolve_model
    from vae_channel_dynamics_tpu.utils import naming

    src = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=9)
    model_io.save_model_dir(str(tmp_path / "vae"), src.config, src.params)
    wrapper = resolve_model(
        {"pretrained_vae_name": str(tmp_path / "vae")}, jnp.float32
    )
    assert wrapper.config == src.config
    a = naming.get_param(wrapper.params, "encoder.conv_in.weight")
    b = naming.get_param(src.params, "encoder.conv_in.weight")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resolve_model_architecture_presets():
    """Every named architecture preset resolves; unknown names fail loudly
    instead of silently building the (335MB-param) sdxl default."""
    import jax.numpy as jnp

    from vae_channel_dynamics_tpu.models import VAEConfig
    from vae_channel_dynamics_tpu.training.loop import resolve_model

    w = resolve_model(
        {"pretrained_vae_name": None, "architecture": "sd"}, jnp.float32
    )
    assert w.config == VAEConfig.sd()
    assert w.config.scaling_factor == pytest.approx(0.18215)
    with pytest.raises(ValueError, match="architecture"):
        resolve_model(
            {"pretrained_vae_name": None, "architecture": "vq"}, jnp.float32
        )


def test_train_cli_auto_resume_no_checkpoint(tmp_path, monkeypatch):
    """--resume_from auto with no checkpoints starts fresh instead of failing."""
    from vae_channel_dynamics_tpu import train as train_cli

    config = {
        "run_name": "auto_resume",
        "output_dir": str(tmp_path),
        "seed": 0,
        "model": {"pretrained_vae_name": None, "architecture": "tiny"},
        "data": {
            "dataset_name": "synthetic://noise",
            "resolution": 16,
            "max_samples": 8,
            "batch_size": 4,
            "do_validation": False,
        },
        "training": {"num_train_epochs": 1, "learning_rate": 1e-4,
                     "lr_warmup_steps": 1, "mixed_precision": "no"},
        "logging": {"log_interval": 1, "report_to": "none"},
        "saving": {"save_interval_steps": 1},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    rc = train_cli.main(["--config_path", str(cfg_path), "--resume_from", "auto"])
    assert rc == 0
    # checkpoints were written; a second auto-resume picks up the latest
    run_dir = tmp_path / "auto_resume"
    assert any(p.name.startswith("chkpt-") for p in run_dir.iterdir())
    rc = train_cli.main(["--config_path", str(cfg_path), "--resume_from", "auto"])
    assert rc == 0


def test_seed_determinism(tmp_path):
    """Two trainers with the same seed produce bit-identical final params
    and loss trajectories (init, data order, posterior sampling, nudges are
    all keyed off config.seed)."""
    import json

    import numpy as np

    from vae_channel_dynamics_tpu.models import io as model_io

    def run(name):
        cfg = {
            "run_name": name,
            "output_dir": str(tmp_path),
            "seed": 7,
            "model": {"pretrained_vae_name": None, "architecture": "tiny"},
            "data": {
                "dataset_name": "synthetic://shapes?num_samples=32",
                "resolution": 32,
                "batch_size": 8,
                "do_validation": False,
            },
            "training": {
                "num_train_epochs": 2,
                "learning_rate": 1e-4,
                "kl_weight": 1e-6,
                "lr_warmup_steps": 2,
                "mixed_precision": "no",
            },
            "logging": {"log_interval": 1, "report_to": "jsonl"},
            "saving": {"save_interval_steps": 1000},
        }
        trainer = Trainer(cfg)
        summary = trainer.train()
        _, params = model_io.load_model_dir(
            os.path.join(summary["final_model_dir"], "vae")
        )
        losses = [
            json.loads(line)["train_loss_step"]
            for line in open(
                os.path.join(str(tmp_path), name, "metrics.jsonl")
            )
            if "train_loss_step" in line
        ]
        return params, losses

    params_a, losses_a = run("det_a")
    params_b, losses_b = run("det_b")
    assert losses_a and losses_a == losses_b
    for a, b in zip(
        jax.tree.leaves(params_a), jax.tree.leaves(params_b)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_params(tmp_path):
    """training.ema_decay maintains an in-graph parameter EMA and exports it
    as final_model/vae_ema; the EMA tracks between the init and the live
    params."""
    import numpy as np

    from vae_channel_dynamics_tpu.models import io as model_io

    cfg = {
        "run_name": "ema_run",
        "output_dir": str(tmp_path),
        "seed": 3,
        "model": {"pretrained_vae_name": None, "architecture": "tiny"},
        "data": {
            "dataset_name": "synthetic://shapes?num_samples=16",
            "resolution": 32,
            "batch_size": 8,
            "do_validation": False,
        },
        "training": {
            "num_train_epochs": 2,
            "learning_rate": 1e-3,
            "ema_decay": 0.9,
            "mixed_precision": "no",
            "lr_warmup_steps": 1,
        },
        "logging": {"log_interval": 10, "report_to": "none"},
        "saving": {"save_interval_steps": 1000},
    }
    summary = Trainer(cfg).train()
    assert "ema_model_dir" in summary
    _, raw = model_io.load_model_dir(
        os.path.join(summary["final_model_dir"], "vae")
    )
    _, ema = model_io.load_model_dir(summary["ema_model_dir"])
    diffs = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree.leaves(raw), jax.tree.leaves(ema))
    ]
    # EMA lags the live params (differs) but stays in their neighborhood
    assert max(diffs) > 0.0
    assert max(diffs) < 0.1


def test_ema_math_unit():
    """One jitted step applies ema' = d*ema + (1-d)*params exactly."""
    import numpy as np

    from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
    from vae_channel_dynamics_tpu.training import (
        TrainState,
        build_optimizer,
        make_train_step,
    )
    import jax.numpy as jnp

    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    x = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)).astype(
        np.float32
    )
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)),
        sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(1e-3, warmup_steps=0, max_train_steps=10)
    state = TrainState.create(params, tx, stats_acc={}, ema=True)
    step = make_train_step(module, tx, 1e-6, donate=False, ema_decay=0.5)
    new_state, _, _ = step(
        state, {"pixel_values": x}, np.ones(2, np.float32),
        jax.random.PRNGKey(1),
    )
    for e0, p1, e1 in zip(
        jax.tree.leaves(params),  # ema starts as a copy of init params
        jax.tree.leaves(new_state.params),
        jax.tree.leaves(new_state.ema_params),
    ):
        np.testing.assert_allclose(
            np.asarray(e1),
            0.5 * np.asarray(e0) + 0.5 * np.asarray(p1),
            atol=1e-7,
        )


def test_resume_matches_uninterrupted_run(tmp_path):
    """A run stopped mid-epoch and resumed from its checkpoint produces the
    SAME loss trajectory and final params as an uninterrupted run: the data
    stream fast-forwards to the checkpoint position (epoch + batch offset),
    the LR schedule and step RNG are step-keyed, and optimizer state rides
    the checkpoint. New capability over the reference (which writes
    checkpoints it can never load, src/train.py:358-362)."""
    from vae_channel_dynamics_tpu.training.checkpoint import latest_checkpoint
    from vae_channel_dynamics_tpu.models import io as model_io

    def make_cfg(name, stop_after=0):
        return {
            "run_name": name,
            "output_dir": str(tmp_path),
            "seed": 11,
            "model": {"pretrained_vae_name": None, "architecture": "tiny"},
            "data": {
                "dataset_name": "synthetic://shapes?num_samples=32",
                "resolution": 32,
                # per-device batch 1 x 8 virtual devices = global batch 8:
                # 4 steps/epoch over the 32 samples
                "batch_size": 1,
                "do_validation": False,
            },
            "training": {
                "num_train_epochs": 2,
                "learning_rate": 1e-4,
                "kl_weight": 1e-6,
                "lr_warmup_steps": 2,
                "mixed_precision": "no",
                # stop mid-epoch-1 (epochs are 4 steps each): proves both the
                # epoch fast-forward and the in-epoch batch skip
                "stop_after_steps": stop_after,
            },
            "logging": {"log_interval": 1, "report_to": "jsonl"},
            "saving": {"save_interval_steps": 1000, "async_save": False},
        }

    def losses_of(name):
        path = os.path.join(str(tmp_path), name, "metrics.jsonl")
        out = {}
        for line in open(path):
            rec = json.loads(line)
            if "train_loss_step" in rec:
                out[rec["step"]] = rec["train_loss_step"]
        return out

    def final_params(summary):
        _, params = model_io.load_model_dir(
            os.path.join(summary["final_model_dir"], "vae")
        )
        return params

    # uninterrupted oracle: 2 epochs x 4 steps
    summary_a = Trainer(make_cfg("uninterrupted")).train()
    params_a = final_params(summary_a)
    losses_a = losses_of("uninterrupted")
    assert set(losses_a) == set(range(1, 9))

    # interrupted at step 6 (mid-epoch 1), then resumed to completion
    Trainer(make_cfg("resumed", stop_after=6)).train()
    run_dir = os.path.join(str(tmp_path), "resumed")
    ckpt = latest_checkpoint(run_dir)
    assert ckpt and ckpt.endswith("chkpt-6")
    summary_b2 = Trainer(make_cfg("resumed"), resume_from=ckpt).train()
    params_b = final_params(summary_b2)
    losses_b = losses_of("resumed")

    # steps 7-8 ran only after resume; they must match the oracle exactly
    assert losses_b == losses_a
    for a, b in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streaming_resume_matches_uninterrupted_run(tmp_path):
    """Same resume-equivalence guarantee for STREAMING (iterable) datasets.

    Streaming epochs have no knowable length (no ``len``), so the stream
    position cannot be derived from ``micro_step`` arithmetic — the
    checkpoint's resume_meta.json sidecar records (epoch, in-epoch batch)
    and resume consume-skips to exactly that point. Without the sidecar the
    fallback derivation (micro_step // max_steps_per_epoch_iterable) would
    restart at epoch 0 and burn a full epoch skipping, replaying different
    data than the uninterrupted run."""
    from vae_channel_dynamics_tpu.training.checkpoint import (
        latest_checkpoint,
        read_resume_meta,
    )
    from vae_channel_dynamics_tpu.models import io as model_io

    def make_cfg(name, stop_after=0):
        return {
            "run_name": name,
            "output_dir": str(tmp_path),
            "seed": 7,
            "model": {"pretrained_vae_name": None, "architecture": "tiny"},
            "data": {
                "dataset_name": "synthetic://shapes?num_samples=32",
                "streaming": True,  # iterable: 4 batches/epoch, no len()
                "resolution": 32,
                "batch_size": 1,
                "do_validation": False,
            },
            "training": {
                "num_train_epochs": 2,
                "learning_rate": 1e-4,
                "kl_weight": 1e-6,
                "lr_warmup_steps": 2,
                "mixed_precision": "no",
                "stop_after_steps": stop_after,  # mid-epoch-1 interrupt
            },
            "logging": {"log_interval": 1, "report_to": "jsonl"},
            "saving": {"save_interval_steps": 1000, "async_save": False},
        }

    def losses_of(name):
        out = {}
        for line in open(os.path.join(str(tmp_path), name, "metrics.jsonl")):
            rec = json.loads(line)
            if "train_loss_step" in rec:
                out[rec["step"]] = rec["train_loss_step"]
        return out

    summary_a = Trainer(make_cfg("stream_oracle")).train()
    losses_a = losses_of("stream_oracle")
    assert set(losses_a) == set(range(1, 9))  # 2 epochs x 4 streamed batches

    Trainer(make_cfg("stream_resumed", stop_after=6)).train()
    ckpt = latest_checkpoint(os.path.join(str(tmp_path), "stream_resumed"))
    assert ckpt and ckpt.endswith("chkpt-6")
    meta = read_resume_meta(ckpt)
    assert meta == {
        "micro_step": 6, "global_step": 6, "epoch": 1, "in_epoch_batches": 2,
    }
    summary_b = Trainer(make_cfg("stream_resumed"), resume_from=ckpt).train()
    assert losses_of("stream_resumed") == losses_a

    def final_params(summary):
        _, params = model_io.load_model_dir(
            os.path.join(summary["final_model_dir"], "vae")
        )
        return params

    for a, b in zip(
        jax.tree.leaves(final_params(summary_a)),
        jax.tree.leaves(final_params(summary_b)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_threads_attention_impl_into_jitted_modules(
    tmp_path, monkeypatch
):
    """model.attention_impl must reach the modules the train/eval steps
    compile, not just the wrapper: a run configured 'chunked' to avoid the
    quadratic attention logits buffer must not silently train with the
    'auto' policy (which picks the naive path at small token counts —
    precisely the program the knob was set to prevent at 512px+)."""
    import vae_channel_dynamics_tpu.training.loop as loop_mod

    created = []
    real = loop_mod.AutoencoderKL

    def spy(*args, **kwargs):
        created.append(kwargs)
        return real(*args, **kwargs)

    monkeypatch.setattr(loop_mod, "AutoencoderKL", spy)
    config = {
        "run_name": "attn_impl_thread",
        "output_dir": str(tmp_path),
        "seed": 0,
        "model": {
            "pretrained_vae_name": None,
            "architecture": "tiny",
            "attention_impl": "chunked",
        },
        "data": {
            "dataset_name": "synthetic://shapes?num_samples=8",
            "resolution": 16,
            "batch_size": 1,
            "do_validation": False,
        },
        "training": {"num_train_epochs": 1, "mixed_precision": "no"},
        "logging": {"log_interval": 1, "report_to": "jsonl"},
        "saving": {"save_interval_steps": 1000},
        "tracking": {
            "enabled": True,
            "track_interval": 1,
            "target_layers": [{
                "name": "vae.encoder.conv_in",
                "capture_point": "output",
                "metrics": ["full_activation_map"],
            }],
        },
    }
    Trainer(config).train()
    step_modules = [k for k in created if "capture" in k]
    assert len(step_modules) >= 2  # plain + maps variants both compiled
    for kwargs in step_modules:
        assert kwargs.get("attn_impl") == "chunked", kwargs
