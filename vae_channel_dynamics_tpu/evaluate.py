"""Evaluation CLI: ``python -m vae_channel_dynamics_tpu.evaluate
--config_path <yaml> --checkpoint_path <dir> [--eval_split test ...]``.

Reference contract (src/evaluate.py): load ``<checkpoint_path>/vae``, run
deterministic reconstruction (``sample_posterior=False``), accumulate
dataset-average MSE (per-element mean, sample-weighted, evaluate.py:231-240)
and KL (evaluate.py:226-239), PSNR/SSIM with torchmetrics conventions
(data_range=1.0 on [0,1]-clamped images, SSIM gaussian k=11 sigma=1.5,
evaluate.py:176-189), save N original/reconstruction PNG pairs, run the
logit lens on the first batch's captured activations, and write
``eval_metrics.txt``."""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from functools import partial

import numpy as np

from .utils.platform import apply_platform_env

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate a trained SDXL VAE.")
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument(
        "--checkpoint_path", type=str, required=True,
        help="Checkpoint dir containing the 'vae' subdirectory.",
    )
    parser.add_argument("--eval_split", type=str, default="test")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--num_samples_to_save", type=int, default=16)
    parser.add_argument("--max_eval_samples", type=int, default=None,
                        help="Cap the evaluated samples (overrides the "
                             "config's validation_max_samples).")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument(
        "--enable_logit_lens", default=True,
        type=lambda x: str(x).lower() == "true",
    )
    parser.add_argument(
        "--logit_lens_layers", type=str, nargs="+",
        default=[
            "encoder.down_blocks.0.resnets.0.norm1",
            "encoder.down_blocks.1.resnets.0.conv_shortcut",
        ],
    )
    parser.add_argument("--logit_lens_num_samples", type=int, default=1)
    parser.add_argument(
        "--logit_lens_projection_type", type=str,
        default="mini_decoder_single_channel",
        choices=["mini_decoder_single_channel", "mini_decoder_full_map"],
    )
    parser.add_argument(
        "--logit_lens_mini_decoder_input_channels", type=int, default=None
    )
    return parser.parse_args(argv)


def _host_float_pixels(x: np.ndarray) -> np.ndarray:
    """Host-side analog of training.step.dequantize_pixels for
    ``data.transfer_dtype: uint8`` batches."""
    if x.dtype == np.uint8:
        return x.astype(np.float32) / 127.5 - 1.0
    return x


def _to_png(arr_hwc_minus1_1: np.ndarray, path: str) -> None:
    from PIL import Image

    img = np.clip((_host_float_pixels(arr_hwc_minus1_1) + 1.0) / 2.0, 0.0, 1.0)
    Image.fromarray((img * 255).astype(np.uint8)).save(path)


def _activation_grid_png(act_chw: np.ndarray, path: str, nrow: int = 8) -> None:
    """Tile per-channel maps into one grid image, globally min-max
    normalized (the make_grid(normalize=True) analog, evaluate.py:273-280)."""
    from PIL import Image

    c, h, w = act_chw.shape
    cols = min(nrow, c)
    rows = (c + cols - 1) // cols
    pad = 2
    grid = np.zeros((rows * (h + pad) + pad, cols * (w + pad) + pad), np.float32)
    lo, hi = float(act_chw.min()), float(act_chw.max())
    norm = (act_chw - lo) / (hi - lo) if hi - lo > 1e-6 else np.zeros_like(act_chw)
    for idx in range(c):
        r, col = divmod(idx, cols)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0 : y0 + h, x0 : x0 + w] = norm[idx]
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)


def main(argv=None) -> int:
    """CLI entry point. Wraps :func:`_eval_main` so the flash-attention
    shard-mesh global this CLI installs (see the ``set_shard_mesh`` call
    below) is restored on every exit path — same install/clear lifecycle
    the Trainer and VAEServer follow, so an in-process caller (tests,
    notebooks) never inherits a stale mesh baked into later traces."""
    apply_platform_env()
    from .ops import pallas_attention

    prev_mesh = pallas_attention._SHARD_MESH
    try:
        return _eval_main(argv)
    finally:
        pallas_attention.set_shard_mesh(prev_mesh)


def _eval_main(argv=None) -> int:
    import jax
    import jax.numpy as jnp

    from .analysis import VAELogitLens
    from .data import create_dataloader, load_and_preprocess_dataset
    from .models import SDXLVAEWrapper
    from .models import io as model_io
    from .ops.image_metrics import psnr_from_accumulated, ssim_per_image
    from .parallel import make_mesh, replicated_sharding
    from .parallel.mesh import (
        batch_sharding,
        pad_batch_to_multiple,
        vector_sharding,
    )
    from .utils.config_utils import warn_unknown_keys, as_int, load_config
    from .utils.logging_utils import setup_logging

    setup_logging()
    args = parse_args(argv)
    config = load_config(args.config_path)
    warn_unknown_keys(config)

    if args.output_dir is None:
        args.output_dir = os.path.join(
            args.checkpoint_path, f"eval_results_{args.eval_split}"
        )
    os.makedirs(args.output_dir, exist_ok=True)
    logger.info("Evaluation results will be saved to: %s", args.output_dir)

    model_load_path = os.path.join(args.checkpoint_path, "vae")
    if not os.path.isdir(model_load_path):
        # a bare model dir (e.g. final_model/vae_ema) works directly, as in
        # the serve CLI
        if os.path.exists(os.path.join(args.checkpoint_path, "config.json")):
            model_load_path = args.checkpoint_path
        else:
            logger.error(
                "VAE model directory not found at: %s", model_load_path
            )
            return 1
    vae_config, params = model_io.load_model_dir(model_load_path)

    mixed_precision = config.get("training", {}).get("mixed_precision", "no")
    dtype = jnp.bfloat16 if mixed_precision in ("bf16", "fp16") else jnp.float32
    # evaluation is forward-only, so 'auto' resolves through the serving
    # policy (flash from 4096 tokens when eligible — fastest at every
    # measured forward point, PERF.md); explicit impls pass through so a
    # run's pinned choice is honored
    from .ops.attention import resolve_serving_impl

    # `resolution` is THE single parse of data.resolution — both the impl
    # decision here and the dataset resize below read it, so the pinned impl
    # always matches the real mid-block token count
    resolution = as_int(config.get("data", {}).get("resolution"), 256)
    ds_factor = 2 ** (len(vae_config.block_out_channels) - 1)
    configured_impl = str(config.get("model", {}).get("attention_impl", "auto"))
    attn_impl = resolve_serving_impl(
        configured_impl,
        (resolution // ds_factor) ** 2,
        vae_config.block_out_channels[-1],
    )
    if attn_impl == "flash" and configured_impl == "auto":
        logger.info(
            "attention_impl=auto: evaluation is forward-only, using the "
            "fused Pallas kernel (flash)."
        )
    wrapper = SDXLVAEWrapper(
        config=vae_config, params=params, dtype=dtype, attn_impl=attn_impl,
    )

    logit_lens = None
    if args.enable_logit_lens:
        ll_main = config.get("logit_lens", {})
        logit_lens = VAELogitLens(
            logit_lens_config={
                "visualization_output_subdir": ll_main.get(
                    "visualization_output_subdir", "logit_lens_visualizations_eval"
                ),
                "default_num_channels_to_viz": ll_main.get("num_channels_to_viz", 4),
                "default_num_batch_samples_to_viz": args.logit_lens_num_samples,
                "colormap": ll_main.get("colormap", "viridis"),
            },
            main_experiment_output_dir=args.output_dir,
            seed=as_int(config.get("seed"), 0),
        )

    # ---------------- dataset (split-dependent source, evaluate.py:141-163) ---
    dc = config.get("data", {})
    if args.eval_split == dc.get("validation_split_name", "validation"):
        dataset_name = dc.get("validation_dataset_name", dc.get("dataset_name"))
        dataset_config_name = dc.get(
            "validation_dataset_config_name", dc.get("dataset_config_name")
        )
        max_samples = dc.get("validation_max_samples")
    else:
        dataset_name = dc.get("dataset_name")
        dataset_config_name = dc.get("dataset_config_name")
        max_samples = None
    if args.max_eval_samples is not None:
        max_samples = args.max_eval_samples
    eval_dataset = load_and_preprocess_dataset(
        dataset_name=dataset_name,
        dataset_config_name=dataset_config_name,
        image_column=dc.get("image_column", "image"),
        resolution=resolution,
        max_samples=max_samples,
        split=args.eval_split,
        seed=as_int(config.get("seed"), 0),
        transfer_dtype=dc.get("transfer_dtype", "float32"),
    )
    mesh = make_mesh()
    n_shards = mesh.devices.size
    if n_shards > 1:
        # flash attention (explicit or auto-resolved above 4096 tokens) must
        # see the mesh before the eval step traces — per-shard shard_map on
        # data meshes; ineligible meshes push auto back to chunked
        from .ops import pallas_attention

        pallas_attention.set_shard_mesh(mesh)
    batch_size = (
        args.batch_size
        if args.batch_size is not None
        else as_int(dc.get("validation_batch_size"), as_int(dc.get("batch_size"), 4))
    )
    loader = create_dataloader(
        eval_dataset, batch_size=batch_size * n_shards,
        num_workers=as_int(dc.get("num_workers"), 0), shuffle=False,
    )

    module = wrapper._module()

    # Shard the eval step over the mesh like the trainer's path does: batch
    # split on the data axis, params replicated (the reference gathers across
    # processes instead, src/evaluate.py:222-228). Without in_shardings every
    # batch would land on device 0 despite the n_shards batch multiplier.
    image_sharding = batch_sharding(mesh)
    mask_sharding = vector_sharding(mesh)
    repl = replicated_sharding(mesh)
    # ONE device-resident parameter copy: re-shard the wrapper's buffers
    # (placed at construction) and hand them back, instead of device_put-ing
    # the host copy a second time — 335 MB per extra copy on the SDXL model
    params = jax.device_put(wrapper.params, repl)
    wrapper.params = params

    @partial(
        jax.jit,
        in_shardings=(repl, {"pixel_values": image_sharding}, mask_sharding),
    )
    def eval_batch(p, batch, mask):
        from .training.step import dequantize_pixels

        pixels_in = dequantize_pixels(batch["pixel_values"])
        out = module.apply(
            {"params": p}, pixels_in, sample_posterior=False
        )
        recon = out["reconstruction"].astype(jnp.float32)
        pixels = pixels_in.astype(jnp.float32)
        per_sample_sq = jnp.mean(
            jnp.square(recon - pixels), axis=tuple(range(1, recon.ndim))
        )
        kl = out["latent_dist"].kl()
        recon01 = jnp.clip((recon + 1.0) / 2.0, 0.0, 1.0)
        pixels01 = jnp.clip((pixels + 1.0) / 2.0, 0.0, 1.0)
        ssim_b = ssim_per_image(recon01, pixels01, data_range=1.0)
        n_obs = jnp.asarray(
            recon.size // recon.shape[0], jnp.float32
        )
        return {
            "reconstruction": out["reconstruction"],
            "mse_weighted_sum": jnp.sum(per_sample_sq * mask),
            "kl_sum": jnp.sum(kl * mask),
            "psnr_sse": jnp.sum(
                jnp.square(recon01 - pixels01)
                * mask[:, None, None, None]
            ),
            "psnr_obs": jnp.sum(mask) * n_obs,
            "ssim_sum": jnp.sum(ssim_b * mask),
            "num_samples": jnp.sum(mask),
        }

    total_mse = total_kl = 0.0
    psnr_sse = psnr_obs = 0.0
    ssim_sum = 0.0
    num_eval_samples = 0
    samples_saved = 0

    logger.info("Starting evaluation on '%s' split...", args.eval_split)
    ran_logit_lens = False
    for step, batch in enumerate(loader):
        if batch is None:
            continue
        padded, mask = pad_batch_to_multiple(batch, n_shards)
        out = eval_batch(params, padded, mask)
        host = jax.device_get(
            {k: v for k, v in out.items() if k != "reconstruction"}
        )
        n = float(host["num_samples"])
        total_mse += float(host["mse_weighted_sum"])
        total_kl += float(host["kl_sum"])
        psnr_sse += float(host["psnr_sse"])
        psnr_obs += float(host["psnr_obs"])
        ssim_sum += float(host["ssim_sum"])
        num_eval_samples += int(n)

        if samples_saved < args.num_samples_to_save:
            recon = np.asarray(jax.device_get(out["reconstruction"]))
            n_valid = int(n)
            take = min(args.num_samples_to_save - samples_saved, n_valid)
            for i in range(take):
                _to_png(
                    batch["pixel_values"][i],
                    os.path.join(args.output_dir, f"sample_{samples_saved}_orig.png"),
                )
                _to_png(
                    recon[i],
                    os.path.join(args.output_dir, f"sample_{samples_saved}_recon.png"),
                )
                samples_saved += 1

        # first SURVIVING batch (a step-index gate would silently skip the
        # lens for the whole run if batch 0 collated to None)
        if (
            not ran_logit_lens
            and args.enable_logit_lens
            and logit_lens is not None
        ):
            ran_logit_lens = True
            logger.info("Running LogitLens on first batch activations...")
            wrapper.add_hooks(args.logit_lens_layers)
            wrapper.forward(
                jnp.asarray(_host_float_pixels(padded["pixel_values"])),
                sample_posterior=False,
            )
            activations = wrapper.get_captured_activations()
            # quirk parity (SURVEY.md §5a-14): the reference writes
            # out_{i}.png capped at 10 and OVERWRITES per layer, so only
            # the last layer's grids survive (src/evaluate.py:272-280) —
            # reproduced deliberately, not an oversight
            for layer, act in activations.items():
                for i in range(min(act.shape[0], 10)):
                    _activation_grid_png(
                        act[i],
                        os.path.join(args.output_dir, f"out_{i}.png"),
                    )
            logit_lens.run_logit_lens_with_activations(
                global_step=0,
                layers_to_analyze=args.logit_lens_layers,
                num_batch_samples_to_viz=args.logit_lens_num_samples,
                projection_type=args.logit_lens_projection_type,
                activations_to_process=activations,
            )
            wrapper.remove_hooks()

    avg_mse = total_mse / num_eval_samples if num_eval_samples else 0.0
    avg_kl = total_kl / num_eval_samples if num_eval_samples else 0.0
    final_psnr = float(
        psnr_from_accumulated(
            jnp.asarray(psnr_sse), jnp.asarray(psnr_obs), data_range=1.0
        )
    ) if psnr_obs else float("nan")
    final_ssim = ssim_sum / num_eval_samples if num_eval_samples else float("nan")

    logger.info("***** Evaluation Results *****")
    logger.info("  Dataset split: %s", args.eval_split)
    logger.info("  Number of samples processed: %d", num_eval_samples)
    logger.info("  Average MSE Loss: %.6f", avg_mse)
    logger.info("  Average KL Divergence: %.6f", avg_kl)
    logger.info("  Average PSNR: %.4f dB", final_psnr)
    logger.info("  Average SSIM: %.4f", final_ssim)
    logger.info("  Saved %d image samples to %s", samples_saved, args.output_dir)

    metrics_path = os.path.join(args.output_dir, "eval_metrics.txt")
    with open(metrics_path, "w") as f:
        f.write(f"Evaluation Split: {args.eval_split}\n")
        f.write(f"Checkpoint Path: {args.checkpoint_path}\n")
        f.write(f"Number of Samples Processed: {num_eval_samples}\n")
        f.write(f"Average MSE: {avg_mse}\n")
        f.write(f"Average KL: {avg_kl}\n")
        f.write(f"Average PSNR: {final_psnr}\n")
        f.write(f"Average SSIM: {final_ssim}\n")
    logger.info("Evaluation metrics saved to %s", metrics_path)
    # machine-readable twin of the reference's txt artifact
    with open(os.path.join(args.output_dir, "eval_metrics.json"), "w") as f:
        json.dump(
            {
                "eval_split": args.eval_split,
                "checkpoint_path": args.checkpoint_path,
                "num_samples": int(num_eval_samples),
                "mse": float(avg_mse),
                "kl": float(avg_kl),
                "psnr": float(final_psnr),
                "ssim": float(final_ssim),
            },
            f,
            indent=2,
        )
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception:  # noqa: BLE001
        logging.getLogger(__name__).error(
            "Unhandled exception during evaluation", exc_info=True
        )
        sys.exit(1)
