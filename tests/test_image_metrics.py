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


def test_ssim_matches_reference_formula():
    """Cross-check against a direct torch implementation of Wang et al. with
    the same (valid-region, gaussian 11/1.5) conventions."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (2, 3, 24, 24)).astype(np.float32)  # NCHW
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)

    k1d = torch.tensor(gaussian_kernel_1d(11, 1.5))
    k2d = (k1d[:, None] @ k1d[None, :]).reshape(1, 1, 11, 11).repeat(3, 1, 1, 1)

    def filt(t):
        return F.conv2d(t, k2d, groups=3)

    xt, yt = torch.tensor(x), torch.tensor(y)
    mu_x, mu_y = filt(xt), filt(yt)
    sxx = filt(xt * xt) - mu_x * mu_x
    syy = filt(yt * yt) - mu_y * mu_y
    sxy = filt(xt * yt) - mu_x * mu_y
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2)
    )
    ref = smap.mean(dim=(1, 2, 3)).numpy()

    ours = np.asarray(
        ssim_per_image(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(y.transpose(0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
