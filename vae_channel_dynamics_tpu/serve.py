"""Batch inference CLI: ``python -m vae_channel_dynamics_tpu.serve
--checkpoint_path <dir> --input <images-or-dataset> --output <dir>``.

The serving-path counterpart of the reference's inference helpers
(src/models/sdxl_vae_wrapper.py:147-179): deterministic encode/decode with
``scaling_factor`` handling, batched over the device mesh, with throughput
reporting. Modes:

- ``reconstruct``  images -> encode -> decode -> PNGs (+ per-image MSE/PSNR)
- ``encode``       images -> scaled latents (saved as .npy)
- ``decode``       latents (.npy) -> PNGs
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

from .utils.platform import apply_platform_env

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Batch VAE inference.")
    p.add_argument("--checkpoint_path", required=True,
                   help="Dir containing the 'vae' subdirectory (or a model dir).")
    p.add_argument("--input", required=True,
                   help="Image directory, synthetic:// name, or .npy latents.")
    p.add_argument("--output", required=True)
    p.add_argument("--mode", default="reconstruct",
                   choices=["reconstruct", "encode", "decode"])
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--deterministic", default=True,
                   type=lambda x: str(x).lower() == "true",
                   help="Use the posterior mode instead of sampling at encode.")
    p.add_argument("--attention_impl", default="auto",
                   choices=["auto", "naive", "chunked", "flash"],
                   help="Mid-block attention: auto picks chunked online "
                        "softmax above 4096 tokens (>512px) — the 1024px "
                        "memory fix (serving is single-device, so auto prefers "
                        "flash there when the shape qualifies); naive is "
                        "fastest at small batch; flash is the fused Pallas "
                        "kernel (chunked memory at naive-or-better speed).")
    p.add_argument("--tile_size", type=int, default=0,
                   help="Enable tiled inference with this pixel tile size "
                        "(diffusers enable_tiling): activations scale with "
                        "the tile, so images larger than HBM allows decode "
                        "in one pass become feasible. 0 = off.")
    p.add_argument("--tile_overlap", type=float, default=0.25,
                   help="Tile overlap fraction for seam blending.")
    p.add_argument("--slicing", action="store_true",
                   help="Process one image per device pass (diffusers "
                        "enable_slicing): batch memory at single-sample cost.")
    return p.parse_args(argv)


def _save_png(arr_hwc: np.ndarray, path: str) -> None:
    from PIL import Image

    img = np.clip((arr_hwc + 1.0) / 2.0, 0.0, 1.0)
    Image.fromarray((img * 255).astype(np.uint8)).save(path)


def main(argv=None) -> int:
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from .data import create_dataloader, load_and_preprocess_dataset
    from .models import SDXLVAEWrapper
    from .models import io as model_io
    from .utils.logging_utils import setup_logging

    setup_logging()
    args = parse_args(argv)
    os.makedirs(args.output, exist_ok=True)

    vae_dir = os.path.join(args.checkpoint_path, "vae")
    if not os.path.isdir(vae_dir):
        vae_dir = args.checkpoint_path
    config, params = model_io.load_model_dir(vae_dir)
    from .server import resolve_serving_attention_impl

    # decode mode: the mid-block token count comes from the LATENT
    # geometry, not --resolution (which describes the encode-side resize) —
    # resolving from the default 256 would leave a 128x128-latent decode
    # (16384 tokens) on the slow non-flash path
    effective_resolution = args.tile_size or args.resolution
    decode_latents = None
    if args.mode == "decode":
        decode_latents = np.load(args.input)
        if decode_latents.ndim == 3:
            decode_latents = decode_latents[None]
        factor = 2 ** (len(config.block_out_channels) - 1)
        effective_resolution = int(decode_latents.shape[1]) * factor
    attn_impl = resolve_serving_attention_impl(
        args.attention_impl, effective_resolution, config,
        logger=logger,
    )
    wrapper = SDXLVAEWrapper(
        config=config, params=params, dtype=jnp.bfloat16,
        attn_impl=attn_impl,
    )
    if args.tile_size:
        wrapper.enable_tiling(args.tile_size, args.tile_overlap)
    if args.slicing:
        wrapper.enable_slicing()
    # Tiling/slicing live on the inference helpers; reconstruct then routes
    # encode -> decode (same deterministic math as forward(), plus the
    # inference [-1,1] clamp) instead of the training-contract forward pass.
    tiled_reconstruct = bool(args.tile_size or args.slicing)

    t0 = time.perf_counter()
    n_processed = 0

    if args.mode == "decode":
        latents = decode_latents
        for start in range(0, latents.shape[0], args.batch_size):
            chunk = jnp.asarray(latents[start : start + args.batch_size])
            imgs = np.asarray(jax.device_get(wrapper.decode(chunk)))
            for i, img in enumerate(imgs):
                _save_png(img, os.path.join(args.output, f"decoded_{start+i}.png"))
            n_processed += imgs.shape[0]
    else:
        dataset = load_and_preprocess_dataset(
            args.input, resolution=args.resolution, max_samples=args.max_samples
        )
        loader = create_dataloader(
            dataset, batch_size=args.batch_size, shuffle=False
        )
        mse_sum = 0.0
        base_rng = jax.random.PRNGKey(0)
        for bi, batch in enumerate(loader):
            if batch is None:
                continue
            # fresh key per batch when sampling — the wrapper's rng=None
            # fallback is a FIXED key, which would draw the identical noise
            # tensor for every batch
            rng = (
                None if args.deterministic
                else jax.random.fold_in(base_rng, bi)
            )
            pixels = jnp.asarray(batch["pixel_values"])
            if args.mode == "encode":
                z = np.asarray(
                    jax.device_get(
                        wrapper.encode(
                            pixels, rng=rng,
                            deterministic=args.deterministic,
                        )
                    ),
                    dtype=np.float32,
                )
                np.save(os.path.join(args.output, f"latents_{bi:05d}.npy"), z)
                n_processed += z.shape[0]
            else:  # reconstruct
                if tiled_reconstruct:
                    recon_dev = wrapper.decode(
                        wrapper.encode(
                            pixels, rng=rng,
                            deterministic=args.deterministic,
                        )
                    )
                else:
                    recon_dev = wrapper.forward(
                        pixels, sample_posterior=not args.deterministic,
                        rng=rng,
                    )["reconstruction"]
                recon = np.asarray(jax.device_get(recon_dev))
                px = np.asarray(batch["pixel_values"])
                mse_sum += float(np.mean((recon - px) ** 2)) * recon.shape[0]
                for i in range(recon.shape[0]):
                    _save_png(
                        recon[i],
                        os.path.join(args.output, f"recon_{n_processed + i}.png"),
                    )
                n_processed += recon.shape[0]
        if args.mode == "reconstruct" and n_processed:
            avg_mse = mse_sum / n_processed
            with open(os.path.join(args.output, "serve_metrics.json"), "w") as f:
                json.dump({"avg_mse": avg_mse, "num_images": n_processed}, f)
            logger.info("Average reconstruction MSE: %.6f", avg_mse)

    elapsed = time.perf_counter() - t0
    logger.info(
        "Processed %d items in %.1fs (%.1f items/s incl. IO)",
        n_processed, elapsed, n_processed / max(elapsed, 1e-9),
    )
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception:  # noqa: BLE001
        logging.getLogger(__name__).error("Serving failed", exc_info=True)
        sys.exit(1)
