"""Component-level numerics parity against PyTorch primitives.

The reference's model math is diffusers/torch; these tests pin our NHWC JAX
ops to the exact torch semantics (GroupNorm eps/variance convention, conv
padding incl. the encoder's asymmetric downsample pad, attention)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vae_channel_dynamics_tpu.models.vae import (
    AttentionBlock,
    ResnetBlock2D,
    VConv,
    Downsample2D,
)
from vae_channel_dynamics_tpu.ops.group_norm import group_norm


def _nhwc(x_t):
    return jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())


def _nchw(x_j):
    return torch.tensor(np.asarray(x_j)).permute(0, 3, 1, 2)


def test_group_norm_matches_torch():
    torch.manual_seed(0)
    x = torch.randn(2, 16, 6, 6)
    scale = torch.randn(16)
    bias = torch.randn(16)
    ref = F.group_norm(x, 8, scale, bias, eps=1e-6)
    out = group_norm(
        _nhwc(x), jnp.asarray(scale.numpy()), jnp.asarray(bias.numpy()),
        num_groups=8, eps=1e-6, impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5
    )


def test_group_norm_silu_fusion_matches_torch():
    torch.manual_seed(1)
    x = torch.randn(1, 8, 5, 5)
    scale = torch.ones(8) * 1.3
    bias = torch.zeros(8) + 0.1
    ref = F.silu(F.group_norm(x, 4, scale, bias, eps=1e-6))
    out = group_norm(
        _nhwc(x), jnp.asarray(scale.numpy()), jnp.asarray(bias.numpy()),
        num_groups=4, eps=1e-6, fuse_silu=True, impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5
    )


def test_conv3x3_matches_torch():
    torch.manual_seed(2)
    x = torch.randn(2, 5, 8, 8)
    w = torch.randn(7, 5, 3, 3)
    b = torch.randn(7)
    ref = F.conv2d(x, w, b, padding=1)
    conv = VConv(features=7)
    params = {
        "kernel": jnp.asarray(w.permute(2, 3, 1, 0).numpy()),
        "bias": jnp.asarray(b.numpy()),
    }
    out = conv.apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )


def test_downsample_asymmetric_pad_matches_torch():
    """Encoder Downsample2D: F.pad (0,1,0,1) then stride-2 valid conv."""
    torch.manual_seed(3)
    x = torch.randn(1, 4, 9, 9)
    w = torch.randn(4, 4, 3, 3)
    b = torch.randn(4)
    ref = F.conv2d(F.pad(x, (0, 1, 0, 1)), w, b, stride=2)
    ds = Downsample2D(channels=4)
    params = {
        "conv": {
            "kernel": jnp.asarray(w.permute(2, 3, 1, 0).numpy()),
            "bias": jnp.asarray(b.numpy()),
        }
    }
    out = ds.apply({"params": params}, _nhwc(x))
    assert out.shape == (1, 4, 4, 4)
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )


def test_resnet_block_matches_torch():
    torch.manual_seed(4)
    in_ch, out_ch, groups = 8, 12, 4
    x = torch.randn(2, in_ch, 6, 6)

    gn1_w, gn1_b = torch.randn(in_ch), torch.randn(in_ch)
    c1_w, c1_b = torch.randn(out_ch, in_ch, 3, 3) * 0.2, torch.randn(out_ch)
    gn2_w, gn2_b = torch.randn(out_ch), torch.randn(out_ch)
    c2_w, c2_b = torch.randn(out_ch, out_ch, 3, 3) * 0.2, torch.randn(out_ch)
    cs_w, cs_b = torch.randn(out_ch, in_ch, 1, 1), torch.randn(out_ch)

    h = F.silu(F.group_norm(x, groups, gn1_w, gn1_b, eps=1e-6))
    h = F.conv2d(h, c1_w, c1_b, padding=1)
    h = F.silu(F.group_norm(h, groups, gn2_w, gn2_b, eps=1e-6))
    h = F.conv2d(h, c2_w, c2_b, padding=1)
    ref = F.conv2d(x, cs_w, cs_b) + h

    block = ResnetBlock2D(in_channels=in_ch, out_channels=out_ch, num_groups=groups)
    params = {
        "norm1": {"scale": jnp.asarray(gn1_w.numpy()), "bias": jnp.asarray(gn1_b.numpy())},
        "conv1": {
            "kernel": jnp.asarray(c1_w.permute(2, 3, 1, 0).numpy()),
            "bias": jnp.asarray(c1_b.numpy()),
        },
        "norm2": {"scale": jnp.asarray(gn2_w.numpy()), "bias": jnp.asarray(gn2_b.numpy())},
        "conv2": {
            "kernel": jnp.asarray(c2_w.permute(2, 3, 1, 0).numpy()),
            "bias": jnp.asarray(c2_b.numpy()),
        },
        "conv_shortcut": {
            "kernel": jnp.asarray(cs_w.permute(2, 3, 1, 0).numpy()),
            "bias": jnp.asarray(cs_b.numpy()),
        },
    }
    out = block.apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )


def test_attention_block_matches_torch():
    torch.manual_seed(5)
    c, groups = 16, 8
    x = torch.randn(2, c, 4, 4)
    gn_w, gn_b = torch.randn(c), torch.randn(c)
    wq, bq = torch.randn(c, c) * 0.3, torch.randn(c)
    wk, bk = torch.randn(c, c) * 0.3, torch.randn(c)
    wv, bv = torch.randn(c, c) * 0.3, torch.randn(c)
    wo, bo = torch.randn(c, c) * 0.3, torch.randn(c)

    h = F.group_norm(x, groups, gn_w, gn_b, eps=1e-6)
    b, _, hh, ww = h.shape
    h = h.reshape(b, c, hh * ww).transpose(1, 2)  # (B, L, C)
    q, k, v = F.linear(h, wq, bq), F.linear(h, wk, bk), F.linear(h, wv, bv)
    attn = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(c), dim=-1)
    o = F.linear(attn @ v, wo, bo)
    ref = x + o.transpose(1, 2).reshape(b, c, hh, ww)

    block = AttentionBlock(channels=c, num_groups=groups)
    params = {
        "group_norm": {"scale": jnp.asarray(gn_w.numpy()), "bias": jnp.asarray(gn_b.numpy())},
        "to_q": {"kernel": jnp.asarray(wq.T.numpy()), "bias": jnp.asarray(bq.numpy())},
        "to_k": {"kernel": jnp.asarray(wk.T.numpy()), "bias": jnp.asarray(bk.numpy())},
        "to_v": {"kernel": jnp.asarray(wv.T.numpy()), "bias": jnp.asarray(bv.numpy())},
        "to_out_0": {"kernel": jnp.asarray(wo.T.numpy()), "bias": jnp.asarray(bo.numpy())},
    }
    out = block.apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )


def test_upsample_nearest_matches_torch():
    from vae_channel_dynamics_tpu.models.vae import Upsample2D

    torch.manual_seed(6)
    x = torch.randn(1, 4, 3, 3)
    w = torch.randn(4, 4, 3, 3)
    b = torch.randn(4)
    ref = F.conv2d(F.interpolate(x, scale_factor=2.0, mode="nearest"), w, b, padding=1)
    up = Upsample2D(channels=4)
    params = {
        "conv": {
            "kernel": jnp.asarray(w.permute(2, 3, 1, 0).numpy()),
            "bias": jnp.asarray(b.numpy()),
        }
    }
    out = up.apply({"params": params}, _nhwc(x))
    assert out.shape == (1, 6, 6, 4)
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )


def test_fused_upsample_gradients_match_materialized():
    """The input-dilated upsampler conv must match nearest-up+conv in value
    AND gradients (it replaces it inside the decoder)."""
    from vae_channel_dynamics_tpu.models.vae import VConv

    torch.manual_seed(7)
    x = jnp.asarray(torch.randn(2, 6, 6, 5).numpy())
    w = jnp.asarray((torch.randn(3, 3, 5, 7) * 0.3).numpy())
    b = jnp.asarray(torch.randn(7).numpy())
    params = {"kernel": w, "bias": b}

    fused = VConv(features=7, fuse_nearest_upsample=True)
    plain = VConv(features=7)

    def loss_fused(p, v):
        return jnp.sum(jnp.sin(fused.apply({"params": p}, v)))

    def loss_plain(p, v):
        v2 = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
        return jnp.sum(jnp.sin(plain.apply({"params": p}, v2)))

    np.testing.assert_allclose(
        float(loss_fused(params, x)), float(loss_plain(params, x)), rtol=1e-5
    )
    gf = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    gp = jax.grad(loss_plain, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(
        np.asarray(gf[0]["kernel"]), np.asarray(gp[0]["kernel"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(gf[0]["bias"]), np.asarray(gp[0]["bias"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gf[1]), np.asarray(gp[1]), rtol=1e-4, atol=1e-5
    )
