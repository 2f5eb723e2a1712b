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
import numpy as np

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


def gather_particles(idx, *arrays, particle_axis: int, chunk: int = 512):
    """Gather each array along ``particle_axis`` with batched indices ``idx``.

    The reference's repeat+gather pattern (sampler.py:150-168), but NOT via
    ``take_along_axis``: a dynamic gather along the particle axis lowers to
    a serial per-element gather on TPU (~100ms for 229k particles, >50x the
    surrounding compute). Instead the permutation is applied as a one-hot
    contraction on the MXU, built in ``chunk``-row blocks. The one-hot
    traffic is O(N_in * N_out) per batch row, so very large particle axes
    (e.g. the terminal flat resample over C*N catalogs) fall back to the
    native gather, which is the cheaper regime there.
    """
    n_out = idx.shape[-1]
    batch = idx.shape[:-1]

    if arrays[0].shape[particle_axis % arrays[0].ndim] > 4096:
        out = []
        for a in arrays:
            ax = particle_axis % a.ndim
            expand = a.ndim - (ax + 1)
            ix = idx.reshape(idx.shape + (1,) * expand)
            ix = jnp.broadcast_to(ix, idx.shape + a.shape[ax + 1 :])
            out.append(jnp.take_along_axis(a, ix, axis=ax))
        return out[0] if len(out) == 1 else tuple(out)

    # flatten every array to [B, N_in, D]; integer payloads ride along as
    # f32 (exact for |v| < 2^24) and are cast back afterwards
    flats, shapes, dtypes = [], [], []
    n_in = None
    for a in arrays:
        ax = particle_axis % a.ndim
        assert a.shape[:ax] == batch
        n_in = a.shape[ax]
        shapes.append(batch + (n_out,) + a.shape[ax + 1 :])
        dtypes.append(a.dtype)
        flats.append(
            a.astype(jnp.float32).reshape(
                (-1, n_in, int(np.prod(a.shape[ax + 1 :], dtype=int)))
            )
        )
    packed = jnp.concatenate(flats, axis=-1)  # [B, N_in, Dtot]
    dims = [f.shape[-1] for f in flats]

    flat_idx = idx.reshape(-1, n_out)  # [B, N_out]
    n_chunks = -(-n_out // chunk)
    pad = n_chunks * chunk - n_out
    if pad:
        flat_idx = jnp.pad(flat_idx, ((0, 0), (0, pad)))
    chunked_idx = flat_idx.reshape(-1, n_chunks, chunk).transpose(1, 0, 2)

    iota = jnp.arange(n_in, dtype=flat_idx.dtype)

    def body(ix):
        # f32 one-hot x f32 values: each output row sums exactly one
        # nonzero term, so the result is bit-exact.
        onehot = (ix[..., :, None] == iota).astype(packed.dtype)
        return jax.lax.dot_general(
            onehot,
            packed,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=packed.dtype,
        )

    gathered = jax.lax.map(body, chunked_idx)  # [K, B, chunk, Dtot]
    gathered = gathered.transpose(1, 0, 2, 3).reshape(
        flat_idx.shape[0], n_chunks * chunk, -1
    )[:, :n_out]

    out = []
    off = 0
    for shape, d, dtype in zip(shapes, dims, dtypes):
        piece = gathered[..., off : off + d].reshape(shape)
        if jnp.issubdtype(dtype, jnp.integer) or dtype == jnp.bool_:
            piece = jnp.rint(piece).astype(dtype)
        out.append(piece)
        off += d
    return out[0] if len(out) == 1 else tuple(out)
