"""Training CLI: ``python -m vae_channel_dynamics_tpu.train --config_path <yaml>``.

The SPMD replacement for ``accelerate launch src/train.py --config_path ...``
(README.md:62): one process per host drives all local devices; multi-host
runs initialize ``jax.distributed`` from cluster env vars. Accepts every
reference ``configs/*.yaml`` unchanged, plus ``--resume_from`` (new
capability; the reference writes checkpoints but cannot load them)."""

from __future__ import annotations

import argparse
import logging
import sys

from .utils.platform import apply_platform_env


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Fine-tune the SDXL VAE with channel-dynamics analysis (TPU)."
    )
    parser.add_argument(
        "--config_path", type=str, required=True,
        help="Path to the experiment YAML configuration.",
    )
    parser.add_argument(
        "--resume_from", type=str, default=None,
        help="Checkpoint directory (chkpt-N or final_model) to resume from.",
    )
    return parser.parse_args(argv)


def main(argv=None) -> int:
    apply_platform_env()
    from .training.loop import Trainer
    from .utils.config_utils import warn_unknown_keys, load_config
    from .utils.logging_utils import setup_logging

    setup_logging()
    args = parse_args(argv)
    config = load_config(args.config_path)
    warn_unknown_keys(config)
    resume_from = args.resume_from
    if resume_from == "auto":
        # find the newest periodic checkpoint in this run's output dir
        import os

        from .training.checkpoint import latest_checkpoint

        run_dir = os.path.join(
            config.get("output_dir", "./results"),
            config.get("run_name", "vae_run"),
        )
        resume_from = latest_checkpoint(
            run_dir,
            config.get("saving", {}).get("checkpoint_dir_prefix", "chkpt"),
        )
        if resume_from:
            logging.getLogger(__name__).info(
                "Auto-resume from %s", resume_from
            )
        else:
            logging.getLogger(__name__).info(
                "Auto-resume: no checkpoint found; starting fresh."
            )
    trainer = Trainer(config, resume_from=resume_from)
    summary = trainer.train()
    logging.getLogger(__name__).info("Run summary: %s", summary)
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception:  # noqa: BLE001
        logging.getLogger(__name__).error(
            "Unhandled exception in main", exc_info=True
        )
        sys.exit(1)
