"""AutoencoderKL: shapes, naming contract, capture taps, distribution, IO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_channel_dynamics_tpu.models import (
    AutoencoderKL,
    DiagonalGaussianDistribution,
    SDXLVAEWrapper,
    VAEConfig,
)
from vae_channel_dynamics_tpu.models import io as model_io
from vae_channel_dynamics_tpu.utils import naming


@pytest.fixture(scope="module")
def tiny_wrapper():
    return SDXLVAEWrapper(config=VAEConfig.tiny(), seed=0)


def test_forward_shapes(tiny_wrapper):
    x = jnp.ones((2, 32, 32, 3), jnp.float32) * 0.1
    out = tiny_wrapper.forward(x, sample_posterior=True, rng=jax.random.PRNGKey(1))
    assert out["reconstruction"].shape == (2, 32, 32, 3)
    # tiny config: 2 blocks -> one downsample -> 16x16 latents, 4 channels
    assert out["latents_sampled"].shape == (2, 16, 16, 4)
    assert out["latent_dist"].mean.shape == (2, 16, 16, 4)
    assert np.all(np.isfinite(np.asarray(out["reconstruction"])))


def test_deterministic_mode(tiny_wrapper):
    x = jnp.ones((1, 32, 32, 3), jnp.float32) * 0.3
    a = tiny_wrapper.forward(x, sample_posterior=False)["reconstruction"]
    b = tiny_wrapper.forward(x, sample_posterior=False)["reconstruction"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_naming_contract(tiny_wrapper):
    params = tiny_wrapper.params
    # the layer names reference YAMLs address (SURVEY.md §2c)
    for name in [
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.resnets.0.norm1.weight",
        "encoder.down_blocks.0.resnets.0.conv1.weight",
        "encoder.down_blocks.1.resnets.0.conv_shortcut.weight",
        "encoder.mid_block.attentions.0.group_norm.weight",
        "encoder.mid_block.attentions.0.to_out.0.weight",
        "encoder.conv_norm_out.weight",
        "decoder.up_blocks.0.resnets.0.norm1.weight",
        "decoder.up_blocks.0.upsamplers.0.conv.weight",
        "decoder.conv_norm_out.weight",
        "decoder.conv_out.weight",
        "quant_conv.weight",
        "post_quant_conv.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight",
    ]:
        assert naming.get_param(params, name) is not None, name
        assert naming.get_param(params, "vae." + name) is not None, name


def test_groupnorm_map_on_real_params(tiny_wrapper):
    m = naming.groupnorm_channel_map(tiny_wrapper.params)
    key = "encoder.down_blocks.0.resnets.0.norm1.output"
    assert m[key][0] == "encoder.down_blocks.0.resnets.0.norm1.weight"
    assert m[key][1] == 16  # tiny block_out_channels[0]
    assert "vae." + key in m


def test_sdxl_param_count():
    """Full SDXL-VAE architecture must have the published parameter count
    (83.65M, matching diffusers AutoencoderKL). Uses eval_shape — no compute."""
    cfg = VAEConfig.sdxl()
    module = AutoencoderKL(config=cfg)
    shapes = jax.eval_shape(
        lambda rng: module.init(
            {"params": rng, "sample": jax.random.PRNGKey(0)},
            jnp.zeros((1, 32, 32, 3), jnp.float32),
            sample_posterior=False,
        ),
        jax.random.PRNGKey(0),
    )
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes["params"]))
    assert n == 83_653_863, n


def test_capture_taps(tiny_wrapper):
    layer = "encoder.down_blocks.0.resnets.0.norm1"
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    module = AutoencoderKL(
        config=VAEConfig.tiny(),
        capture=(
            (layer, "output", ("mean_abs_activation_per_channel", "std_activation")),
            (layer, "input", ("full_activation_map",)),
            ("encoder.conv_in", "output", ("mean_activation",)),
        ),
    )
    out, mutated = module.apply(
        {"params": tiny_wrapper.params},
        x,
        sample_posterior=False,
        mutable=["stats"],
    )
    from vae_channel_dynamics_tpu.models.vae import flatten_stats

    stats = flatten_stats(mutated["stats"])
    per_ch = stats[f"{layer}.output.mean_abs_activation_per_channel"]
    assert per_ch.shape == (16,)
    assert stats[f"{layer}.output.std_activation"].shape == ()
    fam = stats[f"{layer}.input.full_activation_map"]
    assert fam.shape == (2, 16, 32, 32)  # NCHW per reference convention
    assert f"encoder.conv_in.output.mean_activation" in stats
    # tap must not perturb the forward
    ref = tiny_wrapper.forward(x, sample_posterior=False)["reconstruction"]
    np.testing.assert_allclose(
        np.asarray(out["reconstruction"]), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_capture_metric_semantics():
    """mean_abs / mean / std(ddof=1) match torch hook math (monitor.py:56-80)."""
    import torch

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 6))
    from vae_channel_dynamics_tpu.ops.stats import channel_stats

    s = channel_stats(
        x, ("mean_abs_activation_per_channel", "mean_activation", "std_activation")
    )
    xt = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)  # NCHW
    np.testing.assert_allclose(
        np.asarray(s["mean_abs_activation_per_channel"]),
        xt.abs().mean(dim=[0, 2, 3]).numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s["mean_activation"]), xt.mean().numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s["std_activation"]), xt.std().numpy(), rtol=1e-6
    )


def test_distribution_semantics():
    moments = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    dist = DiagonalGaussianDistribution.from_moments(moments)
    # mean first, logvar second (diffusers split order)
    np.testing.assert_array_equal(np.asarray(dist.mean), np.asarray(moments[..., :4]))
    assert dist.mode() is dist.mean
    kl = dist.kl()
    assert kl.shape == (2,)
    mean = np.asarray(moments[..., :4], np.float64)
    logvar = np.clip(np.asarray(moments[..., 4:], np.float64), -30, 20)
    expected = 0.5 * np.sum(
        mean**2 + np.exp(logvar) - 1 - logvar, axis=(1, 2, 3)
    )
    np.testing.assert_allclose(np.asarray(kl), expected, rtol=1e-5)
    # kl of a standard normal posterior is 0
    zero = DiagonalGaussianDistribution.from_moments(jnp.zeros((1, 2, 2, 8)))
    np.testing.assert_allclose(np.asarray(zero.kl()), [0.0], atol=1e-6)
    # sampling statistics
    s = zero.sample(jax.random.PRNGKey(1))
    assert s.shape == (1, 2, 2, 4)


def test_io_roundtrip(tmp_path, tiny_wrapper):
    cfg = VAEConfig.tiny()
    model_io.save_model_dir(str(tmp_path / "vae"), cfg, tiny_wrapper.params)
    loaded_cfg, loaded = model_io.load_model_dir(
        str(tmp_path / "vae"), template=tiny_wrapper.params
    )
    assert loaded_cfg == cfg
    for (p1, a), (p2, b) in zip(
        sorted(naming.iter_torch_named_params(tiny_wrapper.params)),
        sorted(naming.iter_torch_named_params(loaded)),
    ):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_io_torch_layout(tmp_path, tiny_wrapper):
    """Saved state dict uses torch layouts (conv OIHW)."""
    flat = model_io.flatten_params(tiny_wrapper.params)
    k = flat["encoder.conv_in.weight"]
    assert k.shape == (16, 3, 3, 3)  # (out, in, kh, kw)
    gn = flat["encoder.down_blocks.0.resnets.0.norm1.weight"]
    assert gn.shape == (16,)


def test_hook_style_capture(tiny_wrapper):
    layer = "encoder.down_blocks.0.resnets.0.norm1"
    tiny_wrapper.add_hooks([layer])
    x = jnp.ones((1, 32, 32, 3), jnp.float32) * 0.2
    tiny_wrapper.forward(x, sample_posterior=False)
    acts = tiny_wrapper.get_captured_activations()
    assert layer in acts
    assert acts[layer].shape == (1, 16, 32, 32)
    tiny_wrapper.remove_hooks()
    assert tiny_wrapper.get_captured_activations() == {}


@pytest.mark.parametrize("mode", ["full", "conv", "offload"])
def test_remat_grad_parity(tiny_wrapper, mode):
    """Rematerialization modes are numerically invisible: loss and every
    gradient match the no-remat graph exactly. ``full`` = classic block remat
    (save block inputs only); ``conv`` = save conv outputs, recompute only
    the elementwise GroupNorm+SiLU chains in backward (the cheap
    memory/compute point for conv nets); ``offload`` = conv's saved set
    moved to pinned_host memory, fetched back in the backward."""
    cfg = VAEConfig.tiny()
    params = tiny_wrapper.params
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32
    )

    def loss_fn(module, p):
        out = module.apply({"params": p}, x, sample_posterior=False)
        return (
            jnp.mean(out["reconstruction"] ** 2)
            + 1e-6 * jnp.mean(out["latent_dist"].kl())
        )

    base = AutoencoderKL(config=cfg)
    ref_l, ref_g = jax.jit(jax.value_and_grad(lambda p: loss_fn(base, p)))(params)
    m = AutoencoderKL(config=cfg, remat=mode)
    l, g = jax.jit(jax.value_and_grad(lambda p: loss_fn(m, p)))(params)
    assert abs(float(l - ref_l)) < 1e-6
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_remat_capture_taps(tiny_wrapper):
    """Activation-stat taps still sow (and match the no-remat values) when
    the resnet blocks are rematerialized with the conv-output policy."""
    from vae_channel_dynamics_tpu.models.vae import flatten_stats
    from vae_channel_dynamics_tpu.tracking import ActivityMonitor

    cfg = VAEConfig.tiny()
    monitor = ActivityMonitor(
        {
            "enabled": True,
            "track_interval": 1,
            "target_layers": [
                {
                    "name": "vae.encoder.down_blocks.0.resnets.0.norm1",
                    "capture_point": "output",
                    "metrics": ["mean_abs_activation_per_channel"],
                }
            ],
        }
    )
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32
    )
    key = (
        "encoder.down_blocks.0.resnets.0.norm1.output."
        "mean_abs_activation_per_channel"
    )
    vals = {}
    for mode in (False, "conv"):
        m = AutoencoderKL(
            config=cfg, remat=mode, capture=monitor.scalar_capture_table
        )
        _, aux = m.apply(
            {"params": tiny_wrapper.params},
            x,
            sample_posterior=False,
            mutable=["stats"],
        )
        vals[mode] = np.asarray(flatten_stats(aux["stats"])[key])
    np.testing.assert_allclose(vals["conv"], vals[False], atol=1e-6)


def test_remat_invalid_mode(tiny_wrapper):
    m = AutoencoderKL(config=VAEConfig.tiny(), remat="bogus")
    with pytest.raises(ValueError, match="remat"):
        m.apply(
            {"params": tiny_wrapper.params},
            jnp.zeros((1, 32, 32, 3), jnp.float32),
            sample_posterior=False,
        )
