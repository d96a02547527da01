"""GroupNorm (+ optional fused SiLU) for NHWC tensors.

This is the single entry point the model uses; ``impl`` selects between the
pure-XLA path (always available, CPU-testable) and the Pallas TPU kernel
(``vae_channel_dynamics_tpu.ops.pallas_group_norm``) which fuses
normalize+affine+SiLU into one VMEM pass and can emit per-channel activation
statistics as side outputs (the zero-copy replacement for the reference's
forward hooks, src/tracking/monitor.py:82-139).

Numerics contract (matches torch.nn.GroupNorm / diffusers AutoencoderKL):
- statistics over (H, W, C//G) per (sample, group), biased variance (ddof=0)
- eps added to variance before rsqrt (diffusers VAE uses eps=1e-6)
- statistics computed in float32 regardless of input dtype; output cast back
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_IMPL = "auto"


def _group_norm_xla(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int,
    eps: float,
    fuse_silu: bool,
) -> jax.Array:
    """Statistics via sum/sum-of-squares over (H, W, C//G) with the channel
    axis reshaped group-wise ONLY — the spatial dims are never flattened, so
    under spatial (H) sharding GSPMD keeps the data in place and lowers the
    reductions to partial-sums + a small all-reduce instead of a gather."""
    orig_dtype = x.dtype
    b, h, w, c = x.shape
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, cg)
    n = h * w * cg
    s = jnp.sum(xf, axis=(1, 2, 4))  # (B, G)
    q = jnp.sum(jnp.square(xf), axis=(1, 2, 4))
    mean = s / n
    var = q / n - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    # fold stats + affine into per-(sample, channel) a, b: y = x*a + b
    mean_c = jnp.repeat(mean, cg, axis=-1)  # (B, C)
    inv_c = jnp.repeat(inv, cg, axis=-1)
    a = inv_c * scale.astype(jnp.float32)[None, :]
    off = bias.astype(jnp.float32)[None, :] - mean_c * a
    out = x.astype(jnp.float32) * a[:, None, None, :] + off[:, None, None, :]
    if fuse_silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(orig_dtype)


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-6,
    fuse_silu: bool = False,
    impl: str = "auto",
) -> jax.Array:
    """GroupNorm over an NHWC tensor, optionally fused with SiLU.

    Args:
        x: (B, H, W, C) input.
        scale, bias: per-channel affine, shape (C,).
        num_groups: number of channel groups (32 for SDXL-VAE).
        eps: added to variance (1e-6 for SDXL-VAE).
        fuse_silu: apply x*sigmoid(x) after the affine.
        impl: 'xla' | 'pallas' | 'auto' (pallas on TPU when eligible).
    """
    # 'auto' resolves to the XLA path: in the full model XLA fuses the norm
    # with neighboring producers/consumers, and measured end-to-end the
    # Pallas custom-call boundary costs more than its standalone win
    # (full train step @256px: 353 ms XLA vs 496 ms Pallas, even though the
    # isolated kernel is 5.6x faster). The Pallas kernels remain available
    # for explicit use (impl="pallas") and for standalone-norm workloads.
    if impl == "pallas":
        from . import pallas_group_norm

        if not pallas_group_norm.eligible(x, num_groups, impl):
            raise RuntimeError("Pallas group_norm requested but not eligible here")
        return pallas_group_norm.group_norm_silu(
            x, scale, bias, num_groups=num_groups, eps=eps, fuse_silu=fuse_silu
        )
    if impl not in ("auto", "xla", "fused"):
        # 'fused' reaches here for the modules the fused resnet kernel does
        # not cover (conv_in/out norms); anything else is a typo that would
        # silently benchmark the wrong kernel
        raise ValueError(
            f"Unknown group_norm impl {impl!r}; expected 'auto', 'xla', "
            "'pallas' or 'fused'."
        )
    return _group_norm_xla(x, scale, bias, num_groups, eps, fuse_silu)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


__all__ = ["group_norm", "silu"]
