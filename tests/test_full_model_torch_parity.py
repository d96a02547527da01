"""FULL-model numerics parity against a hand-written torch AutoencoderKL.

Component tests (test_numerics_torch_parity.py) pin each op individually;
this composes the complete encoder -> moments -> DiagonalGaussian ->
decode graph in plain torch — replicating the diffusers AutoencoderKL
topology the reference loads (src/models/sdxl_vae_wrapper.py:31-77) — and
asserts tensor-by-tensor parity of the forward, KL, and reconstruction
loss at fp32/HIGHEST on a small-but-SDXL-shaped config. A subtle wiring
deviation (mid-block order, shortcut condition, upsampler fusion,
asymmetric downsample pad, conv_norm_out SiLU) fails here even if every
component test passes.

``load_state_dict(strict=True)`` doubles as a complete check of the
torch-name contract: every converted parameter must land on exactly one
torch parameter, none missing, none unexpected.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from vae_channel_dynamics_tpu.models import SDXLVAEWrapper, VAEConfig
from vae_channel_dynamics_tpu.utils.naming import (
    iter_torch_named_params,
    to_torch_layout,
)

# SDXL-shaped: 4 down blocks, channel doubling then a repeated final width
# (so conv_shortcut exists in blocks 1-2 but NOT 3 — the same pattern as
# (128, 256, 512, 512)), attention mid block, 2 resnets/down, 3 resnets/up.
SDXL_SHAPED = VAEConfig(
    block_out_channels=(32, 64, 128, 128),
    layers_per_block=2,
    norm_num_groups=16,
    latent_channels=4,
    sample_size=32,
)


# --------------------------------------------------------------------------- #
# torch replica of the diffusers AutoencoderKL topology
# --------------------------------------------------------------------------- #
class TResnetBlock2D(nn.Module):
    def __init__(self, cin, cout, groups, eps):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self._shortcut = cin != cout
        if self._shortcut:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self._shortcut:
            x = self.conv_shortcut(x)
        return x + h


class TAttention(nn.Module):
    def __init__(self, c, groups, eps):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=eps)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.group_norm(x).reshape(b, c, hh * ww).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(c), dim=-1)
        o = self.to_out[0](attn @ v)
        return x + o.transpose(1, 2).reshape(b, c, hh, ww)


class TMidBlock(nn.Module):
    def __init__(self, c, groups, eps):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TResnetBlock2D(c, c, groups, eps) for _ in range(2)]
        )
        self.attentions = nn.ModuleList([TAttention(c, groups, eps)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TDownsample2D(nn.Module):
    """diffusers Downsample2D: F.pad (0,1,0,1) then stride-2 valid conv."""

    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TUpsample2D(nn.Module):
    """diffusers Upsample2D: nearest 2x then 3x3 conv."""

    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TDownBlock(nn.Module):
    def __init__(self, cin, cout, n_layers, add_down, groups, eps):
        super().__init__()
        self.resnets = nn.ModuleList(
            [
                TResnetBlock2D(cin if j == 0 else cout, cout, groups, eps)
                for j in range(n_layers)
            ]
        )
        self._down = add_down
        if add_down:
            self.downsamplers = nn.ModuleList([TDownsample2D(cout)])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self._down:
            x = self.downsamplers[0](x)
        return x


class TUpBlock(nn.Module):
    def __init__(self, cin, cout, n_layers, add_up, groups, eps):
        super().__init__()
        self.resnets = nn.ModuleList(
            [
                TResnetBlock2D(cin if j == 0 else cout, cout, groups, eps)
                for j in range(n_layers)
            ]
        )
        self._up = add_up
        if add_up:
            self.upsamplers = nn.ModuleList([TUpsample2D(cout)])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self._up:
            x = self.upsamplers[0](x)
        return x


class TEncoder(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        boc = cfg.block_out_channels
        g, eps = cfg.norm_num_groups, cfg.norm_eps
        self.conv_in = nn.Conv2d(cfg.in_channels, boc[0], 3, padding=1)
        self.down_blocks = nn.ModuleList(
            [
                TDownBlock(
                    boc[i - 1] if i > 0 else boc[0],
                    out_ch,
                    cfg.layers_per_block,
                    i < len(boc) - 1,
                    g,
                    eps,
                )
                for i, out_ch in enumerate(boc)
            ]
        )
        self.mid_block = TMidBlock(boc[-1], g, eps)
        self.conv_norm_out = nn.GroupNorm(g, boc[-1], eps=eps)
        self.conv_out = nn.Conv2d(boc[-1], 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TDecoder(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        rboc = tuple(reversed(cfg.block_out_channels))
        g, eps = cfg.norm_num_groups, cfg.norm_eps
        self.conv_in = nn.Conv2d(cfg.latent_channels, rboc[0], 3, padding=1)
        self.mid_block = TMidBlock(rboc[0], g, eps)
        self.up_blocks = nn.ModuleList(
            [
                TUpBlock(
                    rboc[i - 1] if i > 0 else rboc[0],
                    out_ch,
                    cfg.layers_per_block + 1,
                    i < len(rboc) - 1,
                    g,
                    eps,
                )
                for i, out_ch in enumerate(rboc)
            ]
        )
        self.conv_norm_out = nn.GroupNorm(g, rboc[-1], eps=eps)
        self.conv_out = nn.Conv2d(rboc[-1], cfg.out_channels, 3, padding=1)

    def forward(self, z):
        z = self.conv_in(z)
        z = self.mid_block(z)
        for b in self.up_blocks:
            z = b(z)
        return self.conv_out(F.silu(self.conv_norm_out(z)))


class TAutoencoderKL(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        self.encoder = TEncoder(cfg)
        self.decoder = TDecoder(cfg)
        lc = cfg.latent_channels
        self.quant_conv = nn.Conv2d(2 * lc, 2 * lc, 1)
        self.post_quant_conv = nn.Conv2d(lc, lc, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


def _flax_to_torch_state_dict(params):
    return {
        name: torch.tensor(to_torch_layout(name, leaf))
        for name, leaf in iter_torch_named_params(params)
    }


def _build_pair(seed=0):
    wrapper = SDXLVAEWrapper(config=SDXL_SHAPED, dtype=jnp.float32, seed=seed)
    tmodel = TAutoencoderKL(SDXL_SHAPED).eval().double()
    missing = tmodel.load_state_dict(
        {k: v.double() for k, v in _flax_to_torch_state_dict(wrapper.params).items()},
        strict=True,
    )
    assert not missing.missing_keys and not missing.unexpected_keys
    return wrapper, tmodel


def test_full_forward_kl_and_loss_parity():
    wrapper, tmodel = _build_pair(seed=0)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)

    # --- JAX: deterministic full forward (mode latents) ---
    out = wrapper.forward(jnp.asarray(x), sample_posterior=False)
    j_recon = np.asarray(out["reconstruction"])
    j_mean = np.asarray(out["latent_dist"].mean)
    j_logvar = np.asarray(out["latent_dist"].logvar)
    j_kl = np.asarray(out["latent_dist"].kl())
    j_rec_loss = float(np.mean((j_recon - x) ** 2))

    # --- torch: same graph, float64 for an authoritative oracle ---
    xt = torch.tensor(x.transpose(0, 3, 1, 2), dtype=torch.float64)
    with torch.no_grad():
        moments = tmodel.encode_moments(xt)
        mean, logvar = torch.chunk(moments, 2, dim=1)
        logvar = torch.clamp(logvar, -30.0, 20.0)
        kl = 0.5 * torch.sum(
            mean.pow(2) + logvar.exp() - 1.0 - logvar, dim=[1, 2, 3]
        )
        recon = tmodel.decode(mean)
    t_recon = recon.permute(0, 2, 3, 1).numpy()
    t_mean = mean.permute(0, 2, 3, 1).numpy()
    t_logvar = logvar.permute(0, 2, 3, 1).numpy()
    t_kl = kl.numpy()
    t_rec_loss = float(np.mean((t_recon - x.astype(np.float64)) ** 2))

    # tensor-by-tensor (VERDICT round-1 item 2: tolerance <= 1e-4)
    np.testing.assert_allclose(j_mean, t_mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(j_logvar, t_logvar, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(j_recon, t_recon, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(j_kl, t_kl, rtol=1e-4)
    np.testing.assert_allclose(j_rec_loss, t_rec_loss, rtol=1e-4)

    # full training loss (rec + kl_weight * kl, src/train.py:289-291)
    kl_weight = 1e-6
    j_total = j_rec_loss + kl_weight * float(j_kl.mean())
    t_total = t_rec_loss + kl_weight * float(t_kl.mean())
    np.testing.assert_allclose(j_total, t_total, rtol=1e-4)


def test_sampled_decode_parity_with_shared_noise():
    """Decode a posterior SAMPLE (not the mode) built from externally-shared
    gaussian noise in both frameworks — covers the reparameterized sampling
    path through the full decoder."""
    wrapper, tmodel = _build_pair(seed=1)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)

    dist = wrapper._module().apply(
        {"params": wrapper.params},
        jnp.asarray(x),
        method="encode",
    )
    mean = np.asarray(dist.mean)
    std = np.asarray(dist.std)
    noise = rng.standard_normal(mean.shape).astype(np.float32)
    z = mean + std * noise

    j_img = np.asarray(
        wrapper._module().apply(
            {"params": wrapper.params}, jnp.asarray(z), method="decode"
        )
    )

    zt = torch.tensor(z.transpose(0, 3, 1, 2), dtype=torch.float64)
    with torch.no_grad():
        t_img = tmodel.decode(zt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(j_img, t_img, rtol=1e-4, atol=1e-4)


def test_encode_moments_cross_seed_differs():
    """Sanity guard: two differently-seeded inits must NOT agree — proves the
    parity assertions above have discriminating power."""
    wrapper_a, _ = _build_pair(seed=0)
    wrapper_b, _ = _build_pair(seed=2)
    x = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    )
    ra = np.asarray(wrapper_a.forward(x, sample_posterior=False)["reconstruction"])
    rb = np.asarray(wrapper_b.forward(x, sample_posterior=False)["reconstruction"])
    assert np.abs(ra - rb).max() > 1e-3
