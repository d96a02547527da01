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


def test_sdxl_config_golden_forward():
    """Golden values for the FULL SDXL topology (4 down blocks at
    128/256/512/512, groups=32, attention mid block, 3-resnet up blocks with
    fused upsamplers) at 64px — catches regressions the tiny config can't
    see (e.g. the 512-ch decoder paths, deep-block channel transitions)."""
    import jax.numpy as jnp

    w = SDXLVAEWrapper(config=VAEConfig.sdxl(), seed=7, dtype=jnp.float32)
    x = jax.random.uniform(
        jax.random.PRNGKey(55), (1, 64, 64, 3), minval=-1, maxval=1
    )
    out = w(x, sample_posterior=False)
    r = np.asarray(out["reconstruction"], np.float64)
    kl = np.asarray(out["latent_dist"].kl(), np.float64)
    m = np.asarray(out["latent_dist"].mean, np.float64)
    assert r.mean() == pytest.approx(0.120172829194568, rel=1e-5)
    assert r.std() == pytest.approx(0.3031642927591681, rel=1e-5)
    np.testing.assert_allclose(kl, [18.153228759765625], rtol=1e-5)
    assert m.mean() == pytest.approx(0.03974721985287033, rel=1e-4)
    assert m.std() == pytest.approx(0.32481375660598605, rel=1e-5)


def test_fused_upsampler_matches_materialized_at_sdxl_widths():
    """The input-dilated fused upsampler conv must agree with the
    materialized nearest-up+conv at the REAL decoder channel widths
    (512-in), not just the toy widths of the component test."""
    import jax.numpy as jnp

    from vae_channel_dynamics_tpu.models.vae import VConv

    key = jax.random.PRNGKey(11)
    kx, kw, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (1, 8, 8, 512), jnp.float32)
    params = {
        "kernel": jax.random.normal(kw, (3, 3, 512, 512), jnp.float32) * 0.02,
        "bias": jax.random.normal(kb, (512,), jnp.float32) * 0.1,
    }
    fused = VConv(features=512, fuse_nearest_upsample=True).apply(
        {"params": params}, x
    )
    x_up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    plain = VConv(features=512).apply({"params": params}, x_up)
    assert fused.shape == plain.shape == (1, 16, 16, 512)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), rtol=1e-4, atol=1e-5
    )


def test_sd_family_preset():
    cfg = VAEConfig.sd()
    assert cfg.scaling_factor == pytest.approx(0.18215)
    assert cfg.block_out_channels == (128, 256, 512, 512)  # same topology
    # round-trips through the config dict (model-dir format)
    assert VAEConfig.from_dict(cfg.to_dict()) == cfg
