"""Image quality metrics (PSNR / SSIM) in pure JAX.

The reference computes these with torchmetrics (src/evaluate.py:176-189):
``PeakSignalNoiseRatio(data_range=1.0)`` and
``StructuralSimilarityIndexMeasure(data_range=1.0, gaussian_kernel=True,
sigma=1.5, kernel_size=11)``. Conventions reproduced here:

- PSNR is computed from the GLOBAL accumulated mean squared error over every
  observation in the eval run (not a per-image mean of PSNRs):
  ``10 * log10(data_range^2 / mse_total)``.
- SSIM follows Wang et al. 2004 with an 11x11 gaussian window (sigma 1.5),
  K1=0.01, K2=0.03, computed per channel on the valid (unpadded) region and
  averaged; the run-level value is the sample-weighted mean of per-image
  SSIMs. Inputs are NHWC in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(kernel_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    half = (kernel_size - 1) / 2.0
    coords = np.arange(kernel_size, dtype=np.float64) - half
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter2d_separable(x: jax.Array, k1d: jax.Array) -> jax.Array:
    """Separable valid-mode gaussian filter over H and W of an NHWC tensor,
    applied independently per channel (two 1-D convs ride the MXU-friendly
    conv path instead of an 11x11 dense window)."""
    n, h, w, c = x.shape
    size = k1d.shape[0]
    kh = jnp.tile(k1d.reshape(size, 1, 1, 1), (1, 1, 1, c))  # HWIO, feature_group
    kw = jnp.tile(k1d.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    y = jax.lax.conv_general_dilated(
        y, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y


def ssim_per_image(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Per-image SSIM over NHWC tensors in [0, data_range]. Returns (B,)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    kernel = jnp.asarray(gaussian_kernel_1d(kernel_size, sigma))
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_p = _filter2d_separable(pred, kernel)
    mu_t = _filter2d_separable(target, kernel)
    mu_pp = _filter2d_separable(pred * pred, kernel)
    mu_tt = _filter2d_separable(target * target, kernel)
    mu_pt = _filter2d_separable(pred * target, kernel)

    sigma_p = mu_pp - mu_p * mu_p
    sigma_t = mu_tt - mu_t * mu_t
    sigma_pt = mu_pt - mu_p * mu_t

    num = (2.0 * mu_p * mu_t + c1) * (2.0 * sigma_pt + c2)
    den = (mu_p * mu_p + mu_t * mu_t + c1) * (sigma_p + sigma_t + c2)
    ssim_map = num / den
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def ssim(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    return jnp.mean(ssim_per_image(pred, target, data_range))


def psnr_from_accumulated(
    sum_squared_error: jax.Array, num_observations: jax.Array,
    data_range: float = 1.0,
) -> jax.Array:
    """Run-level PSNR from accumulated SSE / element count (torchmetrics
    PeakSignalNoiseRatio accumulation semantics)."""
    mse = sum_squared_error / jnp.maximum(num_observations, 1.0)
    return 10.0 * jnp.log10((data_range**2) / mse)


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    sse = jnp.sum(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))
    return psnr_from_accumulated(sse, jnp.asarray(pred.size, jnp.float32), data_range)
