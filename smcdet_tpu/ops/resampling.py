"""Particle resampling, fully on-device and batched.

TPU-native replacement for sampler.py:127-169: multinomial resampling via
inverse-CDF ``searchsorted`` (instead of ``torch.multinomial``) and
systematic resampling with strided uniforms (instead of the reference's
per-tile python ``torch.bucketize`` loop, sampler.py:146-148). Both are
O(N log N), gather-based, and vmap over arbitrary leading batch axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "multinomial_indices",
    "systematic_indices",
    "resample_indices",
    "gather_particles",
]


def _searchsorted_batched(cdf, u):
    """searchsorted over the trailing axis, batched over leading axes."""
    def _one(c, x):
        return jnp.searchsorted(c, x, side="left")

    flat_cdf = cdf.reshape((-1, cdf.shape[-1]))
    flat_u = jnp.broadcast_to(u, cdf.shape[:-1] + u.shape[-1:]).reshape(
        (-1, u.shape[-1])
    )
    idx = jax.vmap(_one)(flat_cdf, flat_u)
    return idx.reshape(cdf.shape[:-1] + (u.shape[-1],))


def multinomial_indices(key, weights, num: int):
    """IID draws from ``Categorical(weights)``.

    ``weights``: ``[..., N]`` (normalised). Returns int32 ``[..., num]``.
    """
    cdf = jnp.cumsum(weights, axis=-1)
    u = jax.random.uniform(key, weights.shape[:-1] + (num,))
    idx = _searchsorted_batched(cdf, u) if u.ndim > 1 else jnp.searchsorted(
        cdf, u
    )
    return jnp.clip(idx, 0, weights.shape[-1] - 1).astype(jnp.int32)


def systematic_indices(key, weights, num: int):
    """Systematic (low-variance) resampling.

    One uniform per batch element, strided by 1/num (sampler.py:135-148).
    """
    cdf = jnp.cumsum(weights, axis=-1)
    offset = jax.random.uniform(key, weights.shape[:-1] + (1,))
    u = (jnp.arange(num, dtype=jnp.float32) + offset) / num
    idx = _searchsorted_batched(cdf, u) if u.ndim > 1 else jnp.searchsorted(
        cdf, u
    )
    return jnp.clip(idx, 0, weights.shape[-1] - 1).astype(jnp.int32)


def resample_indices(key, weights, num: int, method: str):
    if method == "multinomial":
        return multinomial_indices(key, weights, num)
    if method == "systematic":
        return systematic_indices(key, weights, num)
    raise ValueError("resample_method must be multinomial or systematic")


def gather_particles(idx, *arrays, particle_axis: int):
    """Gather each array along ``particle_axis`` with batched indices ``idx``.

    ``idx`` has the shape of the arrays up to and including the particle
    axis; trailing axes of each array are carried along (the reference's
    repeat+gather pattern, sampler.py:150-168).
    """
    out = []
    for a in arrays:
        ax = particle_axis % a.ndim
        expand = a.ndim - (ax + 1)
        ix = idx.reshape(idx.shape + (1,) * expand)
        ix = jnp.broadcast_to(ix, idx.shape + a.shape[ax + 1 :])
        out.append(jnp.take_along_axis(a, ix, axis=ax))
    return out[0] if len(out) == 1 else tuple(out)
