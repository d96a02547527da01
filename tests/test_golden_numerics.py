"""Frozen golden values: catch accidental numerics drift across refactors.

Values recorded from the tiny architecture at fixed seeds on the CPU
backend (fp32, HIGHEST conv precision). Any intentional change to init,
GroupNorm math, conv precision, or the distribution must update these
deliberately."""

import jax
import numpy as np
import pytest

from vae_channel_dynamics_tpu.models import SDXLVAEWrapper, VAEConfig


def test_tiny_model_golden_forward():
    w = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=1234)
    x = jax.random.uniform(
        jax.random.PRNGKey(99), (2, 32, 32, 3), minval=-1, maxval=1
    )
    out = w(x, sample_posterior=False)
    r = np.asarray(out["reconstruction"], np.float64)
    kl = np.asarray(out["latent_dist"].kl(), np.float64)
    assert r.mean() == pytest.approx(0.07079274555326265, rel=1e-5)
    assert r.std() == pytest.approx(0.32392018661927185, rel=1e-5)
    np.testing.assert_allclose(
        kl, [99.02616882324219, 101.75218963623047], rtol=1e-5
    )


def test_sd_family_preset():
    cfg = VAEConfig.sd()
    assert cfg.scaling_factor == pytest.approx(0.18215)
    assert cfg.block_out_channels == (128, 256, 512, 512)  # same topology
    # round-trips through the config dict (model-dir format)
    assert VAEConfig.from_dict(cfg.to_dict()) == cfg
