"""Diagonal Gaussian posterior over NHWC latents.

API parity with the diffusers object the reference consumes
(src/models/sdxl_vae_wrapper.py:60-66, src/train.py:290, src/evaluate.py:226):
``sample()``, ``mode()``, ``kl()`` (per-sample KL against N(0, I), summed over
all latent dims), ``nll()``. Registered as a pytree so it can cross jit
boundaries inside the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class DiagonalGaussianDistribution(struct.PyTreeNode):
    mean: jax.Array
    logvar: jax.Array

    @classmethod
    def from_moments(cls, moments: jax.Array) -> "DiagonalGaussianDistribution":
        """Split a (..., 2C) moments tensor into mean/logvar, clamping logvar
        to [-30, 20] (diffusers convention)."""
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return cls(mean=mean, logvar=logvar)

    @property
    def std(self) -> jax.Array:
        return jnp.exp(0.5 * self.logvar.astype(jnp.float32))

    @property
    def var(self) -> jax.Array:
        return jnp.exp(self.logvar.astype(jnp.float32))

    def sample(self, rng: jax.Array) -> jax.Array:
        noise = jax.random.normal(rng, self.mean.shape, dtype=jnp.float32)
        return (self.mean.astype(jnp.float32) + self.std * noise).astype(
            self.mean.dtype
        )

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        """KL(q || N(0, I)) per sample: 0.5 * sum(mu^2 + var - 1 - logvar)
        over all non-batch dims. Returns shape (B,)."""
        mean = self.mean.astype(jnp.float32)
        logvar = self.logvar.astype(jnp.float32)
        axes = tuple(range(1, mean.ndim))
        return 0.5 * jnp.sum(
            jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar, axis=axes
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        """Negative log-likelihood of ``sample`` per batch element."""
        mean = self.mean.astype(jnp.float32)
        logvar = self.logvar.astype(jnp.float32)
        axes = tuple(range(1, mean.ndim))
        log2pi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            log2pi
            + logvar
            + jnp.square(sample.astype(jnp.float32) - mean) / jnp.exp(logvar),
            axis=axes,
        )
