"""Diagonal Gaussian posterior used by the KL-VAE.

Equivalent of ``ldm/modules/distributions/distributions.py:4-81``: moments are
``[mean, logvar]`` concatenated along the channel axis, logvar clamped to
[-30, 20]. JAX-native: sampling takes an explicit PRNG key.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class DiagonalGaussian:
    def __init__(self, moments: Array, deterministic: bool = False, channel_axis: int = 1):
        self.mean, logvar = jnp.split(moments, 2, axis=channel_axis)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key: jax.random.PRNGKey) -> Array:
        if self.deterministic:
            return self.mean
        return self.mean + self.std * jax.random.normal(key, self.mean.shape, self.mean.dtype)

    def mode(self) -> Array:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussian"] = None) -> Array:
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), self.mean.dtype)
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(self.mean**2 + self.var - 1.0 - self.logvar, axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=axes,
        )

    def nll(self, sample: Array) -> Array:
        if self.deterministic:
            return jnp.zeros((sample.shape[0],), sample.dtype)
        logtwopi = jnp.log(2.0 * jnp.pi)
        axes = tuple(range(1, sample.ndim))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var, axis=axes
        )


def normal_kl(mean1: Array, logvar1: Array, mean2: Array, logvar2: Array) -> Array:
    """KL between two diagonal Gaussians, broadcasting over shapes."""
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )
