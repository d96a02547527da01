"""PSNR / SSIM numerics: known values, invariants, torch cross-check."""

import jax.numpy as jnp
import numpy as np
import pytest

from vae_channel_dynamics_tpu.ops.image_metrics import (
    gaussian_kernel_1d,
    psnr,
    psnr_from_accumulated,
    ssim,
    ssim_per_image,
)


def test_gaussian_kernel_normalized():
    k = gaussian_kernel_1d(11, 1.5)
    assert k.shape == (11,)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    assert k[5] == k.max()  # centered
    np.testing.assert_allclose(k, k[::-1], rtol=1e-6)  # symmetric


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)


def test_psnr_accumulation_matches_global():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape).astype(np.float32), 0, 1)
    direct = float(psnr(jnp.asarray(x), jnp.asarray(y)))
    sse = ((x[:2] - y[:2]) ** 2).sum() + ((x[2:] - y[2:]) ** 2).sum()
    acc = float(
        psnr_from_accumulated(jnp.asarray(sse), jnp.asarray(float(x.size)))
    )
    np.testing.assert_allclose(direct, acc, rtol=1e-5)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    np.testing.assert_allclose(float(ssim(x, x)), 1.0, atol=1e-5)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(2)
    x = rng.uniform(0.3, 0.7, (1, 32, 32, 3)).astype(np.float32)
    small = np.clip(x + rng.normal(0, 0.01, x.shape), 0, 1).astype(np.float32)
    big = np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1).astype(np.float32)
    s_small = float(ssim(jnp.asarray(small), jnp.asarray(x)))
    s_big = float(ssim(jnp.asarray(big), jnp.asarray(x)))
    assert 0.9 < s_small <= 1.0
    assert s_big < s_small


def test_ssim_symmetry_and_shape():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (3, 24, 24, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (3, 24, 24, 3)).astype(np.float32))
    per = ssim_per_image(x, y)
    assert per.shape == (3,)
    np.testing.assert_allclose(
        np.asarray(ssim_per_image(x, y)), np.asarray(ssim_per_image(y, x)),
        rtol=1e-5,
    )


def _torchmetrics_ssim_oracle(preds_nchw, target_nchw, data_range=1.0,
                              kernel_size=11, sigma=1.5):
    """Independent oracle: a faithful replica of torchmetrics'
    StructuralSimilarityIndexMeasure update path (torchmetrics
    functional.image.ssim._ssim_update — the implementation the reference
    runs at src/evaluate.py:176-189), written in plain torch. torchmetrics
    is NOT installed here, so the algorithm is transcribed step by step:
    reflect-pad by (k-1)//2, single grouped conv2d with the OUTER-PRODUCT
    2-D gaussian kernel built from dist=arange((1-k)/2, (1+k)/2), compute
    the SSIM index on the padded frame, crop the pad margin back off, and
    take the per-image mean. Returns the per-image SSIM vector."""
    import torch
    import torch.nn.functional as F

    preds = torch.tensor(preds_nchw, dtype=torch.float64)
    target = torch.tensor(target_nchw, dtype=torch.float64)
    channel = preds.shape[1]

    # torchmetrics _gaussian: dist over [(1-k)/2, (1+k)/2), normalized
    dist = torch.arange(
        start=(1 - kernel_size) / 2, end=(1 + kernel_size) / 2, step=1,
        dtype=torch.float64,
    )
    gauss = torch.exp(-torch.pow(dist / sigma, 2) / 2)
    gauss_1d = (gauss / gauss.sum()).unsqueeze(0)
    kernel_2d = torch.matmul(gauss_1d.t(), gauss_1d)  # (k, k)
    kernel = kernel_2d.expand(channel, 1, kernel_size, kernel_size)

    pad = (kernel_size - 1) // 2
    preds_p = F.pad(preds, (pad, pad, pad, pad), mode="reflect")
    target_p = F.pad(target, (pad, pad, pad, pad), mode="reflect")

    # torchmetrics batches all five statistics through one conv call
    input_list = torch.cat(
        (preds_p, target_p, preds_p * preds_p, target_p * target_p,
         preds_p * target_p)
    )
    outputs = F.conv2d(input_list, kernel, groups=channel)
    b = preds.shape[0]
    mu_pred, mu_target, s_pred, s_target, s_pt = (
        outputs[i * b : (i + 1) * b] for i in range(5)
    )
    sigma_pred = s_pred - mu_pred * mu_pred
    sigma_target = s_target - mu_target * mu_target
    sigma_pt = s_pt - mu_pred * mu_target

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    upper = 2 * sigma_pt + c2
    lower = sigma_pred + sigma_target + c2
    ssim_full = ((2 * mu_pred * mu_target + c1) * upper) / (
        (mu_pred**2 + mu_target**2 + c1) * lower
    )
    ssim_idx = ssim_full[..., pad:-pad, pad:-pad]
    return ssim_idx.reshape(b, -1).mean(-1).numpy()


def test_ssim_matches_torchmetrics_replica():
    """Pin the JAX SSIM against the torchmetrics-algorithm oracle above
    (the reference's metric implementation, src/evaluate.py:179-183) —
    NOT a restatement of our own valid-window formula."""
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)  # NCHW
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)

    ref = _torchmetrics_ssim_oracle(x, y)
    ours = np.asarray(
        ssim_per_image(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(y.transpose(0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_ssim_matches_torchmetrics_replica_structured_images():
    """Same oracle on structured (non-noise) content, nonsquare, with a
    non-unit data_range and single channel."""
    h, w = 40, 28
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.5 + 0.5 * np.sin(xx / 3.0) * np.cos(yy / 5.0)
    distorted = np.clip(base * 0.9 + 0.05 + 0.02 * np.sin(yy), 0, 2)
    x = np.stack([base, distorted])[:, None]  # (2, 1, H, W)
    y = np.stack([base, base])[:, None]

    ref = _torchmetrics_ssim_oracle(x, y, data_range=2.0)
    ours = np.asarray(
        ssim_per_image(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(y.transpose(0, 2, 3, 1)),
            data_range=2.0,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ref[0], 1.0, atol=1e-6)  # identical pair


def test_psnr_matches_torchmetrics_accumulation_semantics():
    """torchmetrics PeakSignalNoiseRatio (data_range=1.0, default reduction)
    accumulates sum-squared-error and observation count across update()
    calls, then computes 10*log10(dr^2 / (sse/total)). Replicate that
    batched accumulation in torch and pin psnr_from_accumulated to it."""
    import torch

    rng = np.random.default_rng(7)
    batches = [
        rng.uniform(0, 1, (3, 8, 8, 3)).astype(np.float32) for _ in range(3)
    ]
    targets = [
        np.clip(b + rng.normal(0, 0.03, b.shape), 0, 1).astype(np.float32)
        for b in batches
    ]

    # oracle: the torchmetrics update/compute state machine
    sse = torch.tensor(0.0, dtype=torch.float64)
    total = torch.tensor(0.0, dtype=torch.float64)
    for b, t in zip(batches, targets):
        bt, tt = torch.tensor(b, dtype=torch.float64), torch.tensor(
            t, dtype=torch.float64
        )
        sse = sse + torch.sum(torch.pow(bt - tt, 2))
        total = total + bt.numel()
    ref = float(
        (2 * torch.log(torch.tensor(1.0, dtype=torch.float64))
         - torch.log(sse / total))
        * (10 / torch.log(torch.tensor(10.0, dtype=torch.float64)))
    )

    acc_sse = sum(float(((b - t) ** 2).sum()) for b, t in zip(batches, targets))
    acc_n = sum(b.size for b in batches)
    ours = float(
        psnr_from_accumulated(jnp.asarray(acc_sse), jnp.asarray(float(acc_n)))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
