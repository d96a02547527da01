"""Offline dataset-level golden eval-parity harness.

The reference's published Table 1 numbers (paper §5.1) come from running
``src/evaluate.py`` over real CIFAR-10/Imagenette images — unreachable here
(no network egress). This harness is the offline answer: it pins, at
DATASET granularity, that this framework's ``evaluate`` CLI and an
authoritative float64 torch oracle implementing the reference's exact
accumulation conventions (src/evaluate.py:220-328) produce identical
MSE / KL / PSNR / SSIM over an identical committed dataset and an identical
imported-torch checkpoint — i.e. that given the real data, the eval stack
would reproduce the reference's numbers.

Committed fixture (regenerate with ``python tests/golden_eval_harness.py``,
from the repo root):

  tests/fixtures/golden_eval/images/   48 deterministic photo-like 64x64 PNGs
  tests/fixtures/golden_eval/torch_ckpt/   diffusers-format checkpoint whose
      weights were produced by a SEEDED TORCH model (true names, true
      OIHW/(out,in) layouts — the byte format the reference's
      ``from_pretrained`` consumes, src/models/sdxl_vae_wrapper.py:31-34)
  tests/fixtures/golden_eval/golden_metrics.json   the float64 torch
      oracle's dataset-level metrics over exactly those images through
      exactly that checkpoint

The oracle replicates the reference's accumulation exactly:
  * deterministic reconstruction from the posterior MODE (evaluate.py:207),
  * MSE: per-batch mean weighted by batch size (evaluate.py:231-240),
  * KL: per-item KL (logvar clamped to [-30, 20]) batch-mean weighted by
    batch size (evaluate.py:226-239),
  * PSNR: torchmetrics-style global SSE/obs accumulation over
    [0,1]-clamped images, data_range=1.0 (evaluate.py:176-189, 243-249),
  * SSIM: torchmetrics gaussian k=11 sigma=1.5 per-image mean
    (via the transcribed torchmetrics replica in test_image_metrics.py).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden_eval")
IMAGES_DIR = os.path.join(FIXTURE_DIR, "images")
CKPT_DIR = os.path.join(FIXTURE_DIR, "torch_ckpt")
GOLDEN_JSON = os.path.join(FIXTURE_DIR, "golden_metrics.json")

NUM_IMAGES = 48
RESOLUTION = 64
BATCH_SIZE = 8
TORCH_SEED = 20260819
IMAGE_SEED = 415


def fixture_config():
    """A 4-block VAE with the SDXL channel pattern (doubling then repeated
    final width, attention mid block) small enough to evaluate 48 images on
    one CPU core in seconds and to commit as a ~6 MB safetensors fixture."""
    from vae_channel_dynamics_tpu.models.vae import VAEConfig

    return VAEConfig(
        block_out_channels=(16, 32, 64, 64),
        layers_per_block=2,
        norm_num_groups=8,
        latent_channels=4,
        sample_size=RESOLUTION,
    )


def make_images(out_dir: str = IMAGES_DIR) -> None:
    """48 deterministic photo-like images: low-frequency random Fourier
    fields per channel (smooth content with real structure, so SSIM's
    local statistics are exercised) plus a luminance gradient. Saved as
    PNGs at exactly 64x64 so the eval pipeline's shorter-side-resize +
    center-crop is the identity and parity isn't coupled to any resize
    implementation."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(IMAGE_SEED)
    yy, xx = np.mgrid[0:RESOLUTION, 0:RESOLUTION] / RESOLUTION
    for i in range(NUM_IMAGES):
        img = np.zeros((RESOLUTION, RESOLUTION, 3))
        for c in range(3):
            field = np.zeros((RESOLUTION, RESOLUTION))
            for _ in range(6):
                fx, fy = rng.uniform(0.5, 4.0, 2)
                phase = rng.uniform(0, 2 * np.pi, 2)
                amp = rng.uniform(0.1, 0.5)
                field += amp * np.sin(2 * np.pi * fx * xx + phase[0]) * np.sin(
                    2 * np.pi * fy * yy + phase[1]
                )
            img[..., c] = field
        img += rng.uniform(-0.5, 0.5) * (xx + yy)[..., None]
        img += 0.05 * rng.standard_normal(img.shape)  # sensor-ish noise
        lo, hi = img.min(), img.max()
        u8 = np.round((img - lo) / (hi - lo) * 255.0).astype(np.uint8)
        Image.fromarray(u8).save(os.path.join(out_dir, f"img_{i:04d}.png"))


def build_torch_model():
    """The fixture's torch model, seeded and never touched by flax init —
    weights flow torch -> safetensors -> converter -> flax only."""
    import torch

    from test_full_model_torch_parity import TAutoencoderKL

    torch.manual_seed(TORCH_SEED)
    return TAutoencoderKL(fixture_config()).eval()


def write_ckpt(tmodel, out_dir: str = CKPT_DIR) -> None:
    from safetensors.numpy import save_file

    cfg = fixture_config()
    os.makedirs(out_dir, exist_ok=True)
    sd = {
        k: np.ascontiguousarray(v.detach().numpy())
        for k, v in tmodel.state_dict().items()
    }
    save_file(sd, os.path.join(out_dir, "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(
            {
                "_class_name": "AutoencoderKL",
                "in_channels": cfg.in_channels,
                "out_channels": cfg.out_channels,
                "block_out_channels": list(cfg.block_out_channels),
                "layers_per_block": cfg.layers_per_block,
                "latent_channels": cfg.latent_channels,
                "norm_num_groups": cfg.norm_num_groups,
                "scaling_factor": cfg.scaling_factor,
                "sample_size": cfg.sample_size,
            },
            f,
        )


def load_images_minus1_1(images_dir: str = IMAGES_DIR) -> np.ndarray:
    """The dataset exactly as the eval pipeline sees it: sorted paths,
    RGB uint8 -> x/255*2-1 (ToTensor + Normalize(0.5, 0.5) parity,
    reference data_utils.py:24-30), HWC float64."""
    from PIL import Image

    paths = sorted(
        os.path.join(images_dir, f)
        for f in os.listdir(images_dir)
        if f.endswith(".png")
    )
    imgs = [
        np.asarray(Image.open(p).convert("RGB"), dtype=np.float64)
        for p in paths
    ]
    return np.stack(imgs) / 255.0 * 2.0 - 1.0


def torch_oracle(tmodel, images_hwc: np.ndarray,
                 batch_size: int = BATCH_SIZE) -> dict:
    """Dataset-level metrics in float64 with the reference's exact
    accumulation semantics (src/evaluate.py:220-328)."""
    import torch

    from test_image_metrics import _torchmetrics_ssim_oracle

    tmodel = tmodel.double()
    n = images_hwc.shape[0]
    total_mse = total_kl = 0.0
    psnr_sse = psnr_obs = 0.0
    ssim_vals = []
    with torch.no_grad():
        for start in range(0, n, batch_size):
            x = images_hwc[start : start + batch_size]
            xt = torch.tensor(x.transpose(0, 3, 1, 2), dtype=torch.float64)
            moments = tmodel.encode_moments(xt)
            mean, logvar = torch.chunk(moments, 2, dim=1)
            logvar = torch.clamp(logvar, -30.0, 20.0)
            kl = 0.5 * torch.sum(
                mean.pow(2) + logvar.exp() - 1.0 - logvar, dim=[1, 2, 3]
            )
            recon = tmodel.decode(mean)
            b = xt.shape[0]
            # MSE/KL: per-batch mean weighted by batch size
            total_mse += torch.mean((recon - xt) ** 2).item() * b
            total_kl += kl.mean().item() * b
            # PSNR: torchmetrics accumulation (global SSE / global obs)
            r01 = torch.clamp((recon + 1.0) / 2.0, 0.0, 1.0)
            x01 = torch.clamp((xt + 1.0) / 2.0, 0.0, 1.0)
            psnr_sse += torch.sum((r01 - x01) ** 2).item()
            psnr_obs += float(r01.numel())
            # SSIM: per-image values, dataset mean at the end
            ssim_vals.extend(
                _torchmetrics_ssim_oracle(r01.numpy(), x01.numpy())
            )
    return {
        "num_samples": n,
        "mse": total_mse / n,
        "kl": total_kl / n,
        "psnr": 10.0 * np.log10(1.0 / (psnr_sse / psnr_obs)),
        "ssim": float(np.mean(ssim_vals)),
    }


def generate_all() -> dict:
    make_images()
    tmodel = build_torch_model()
    write_ckpt(tmodel)
    metrics = torch_oracle(tmodel, load_images_minus1_1())
    with open(GOLDEN_JSON, "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    print(json.dumps(generate_all(), indent=2))
