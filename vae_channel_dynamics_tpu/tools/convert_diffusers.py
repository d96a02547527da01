"""Convert a diffusers AutoencoderKL checkpoint directory to this
framework's model-dir format (and back).

Usage:
    python -m vae_channel_dynamics_tpu.tools.convert_diffusers \
        --src /path/to/stabilityai-sdxl-vae --dst ./sdxl_vae_tpu

The source directory is a locally downloaded diffusers model
(``config.json`` + ``diffusion_pytorch_model.safetensors``). The converter
maps torch parameter names/layouts to the Flax pytree (utils/naming.py) and
writes our model dir, which ``model.pretrained_vae_name`` and the evaluate
CLI load directly. This enables tensor-by-tensor parity checks against the
reference's pretrained weights when a checkpoint is available locally
(the reference fetches it from the Hub at src/models/sdxl_vae_wrapper.py:31-34).

``--reverse`` converts the other way: a model dir written by this framework
(including pre-round-3 ``model.safetensors`` dirs) is re-emitted as a
canonical diffusers AutoencoderKL directory — full constructor config.json
plus ``diffusion_pytorch_model.safetensors`` — so a TPU-trained checkpoint
loads on a torch machine via ``AutoencoderKL.from_pretrained``, the same
artifact the reference's own training run exports (src/train.py:409-415).
Model dirs saved in round 3+ are already in this format; ``--reverse``
exists to upgrade old dirs and to make the round trip an explicit tool.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

from ..utils.platform import apply_platform_env

logger = logging.getLogger(__name__)

_DIFFUSERS_WEIGHT_NAMES = (
    "diffusion_pytorch_model.safetensors",
    "model.safetensors",
)


def convert(src: str, dst: str) -> None:
    from safetensors.numpy import load_file

    from ..models import SDXLVAEWrapper
    from ..models import io as model_io
    from ..models.vae import VAEConfig

    with open(os.path.join(src, "config.json")) as f:
        diff_cfg = json.load(f)
    config = VAEConfig(
        in_channels=diff_cfg.get("in_channels", 3),
        out_channels=diff_cfg.get("out_channels", 3),
        block_out_channels=tuple(
            diff_cfg.get("block_out_channels", (128, 256, 512, 512))
        ),
        layers_per_block=diff_cfg.get("layers_per_block", 2),
        latent_channels=diff_cfg.get("latent_channels", 4),
        norm_num_groups=diff_cfg.get("norm_num_groups", 32),
        scaling_factor=diff_cfg.get("scaling_factor", 0.13025),
        sample_size=diff_cfg.get("sample_size", 1024),
        mid_block_attention=bool(diff_cfg.get("mid_block_add_attention", True)),
    )
    weights_path = None
    for name in _DIFFUSERS_WEIGHT_NAMES:
        cand = os.path.join(src, name)
        if os.path.exists(cand):
            weights_path = cand
            break
    if weights_path is None:
        raise FileNotFoundError(
            f"No safetensors weights found in {src} (looked for "
            f"{_DIFFUSERS_WEIGHT_NAMES})"
        )
    state_dict = load_file(weights_path)
    logger.info("Loaded %d tensors from %s", len(state_dict), weights_path)

    template = SDXLVAEWrapper(config=config).params
    params = model_io.import_diffusers_state_dict(template, state_dict)
    model_io.save_model_dir(dst, config, params)
    logger.info("Converted model written to %s", dst)


def export(src: str, dst: str) -> None:
    """Model dir written by this framework -> canonical diffusers dir."""
    from ..models import io as model_io

    config, params = model_io.load_model_dir(src)
    model_io.save_model_dir(dst, config, params)
    logger.info("Diffusers-format model written to %s", dst)


def main(argv=None) -> int:
    apply_platform_env()
    from ..utils.logging_utils import setup_logging

    setup_logging()
    parser = argparse.ArgumentParser(
        description="Convert between diffusers AutoencoderKL dirs and this "
        "framework's model dirs (which are diffusers-compatible)."
    )
    parser.add_argument("--src", required=True, help="source model dir")
    parser.add_argument("--dst", required=True, help="output model dir")
    parser.add_argument(
        "--reverse",
        action="store_true",
        help="export a framework model dir as a canonical diffusers dir "
        "(default: import a diffusers dir into the framework format)",
    )
    args = parser.parse_args(argv)
    (export if args.reverse else convert)(args.src, args.dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
