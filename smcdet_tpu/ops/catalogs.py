"""Fixed-shape padded-catalog operations.

The reference's recurring idiom is mask → sort-by-mask → gather compaction
(e.g. sampler.py:198-219, images.py:191-210, aggregate.py:245-262). These
helpers implement it once, gather-based and fully shape-static, so it jits
and shards cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["compact_catalog", "prune_catalog", "slot_mask"]


def slot_mask(counts, max_objects: int):
    """``[..., M]`` bool mask with slot m active iff ``m < count``."""
    return jnp.arange(max_objects) < counts[..., None]


def _apply_slot_perm(values, order):
    """Apply a permutation ``order [..., M]`` along the slot axis of
    ``values [..., M, *ev]`` as a one-hot contraction.

    NOTE (TPU): ``take_along_axis`` along the tiny slot axis lowers to a
    serial per-element gather — the terminal compaction's gathers cost
    ~100ms on a 16x14336x6 batch, more than several SMC iterations. The
    one-hot einsum is pure vector math.
    """
    M = order.shape[-1]
    onehot = (order[..., :, None] == jnp.arange(M)).astype(values.dtype)
    ev = values.ndim - order.ndim
    oh = onehot.reshape(onehot.shape + (1,) * ev)
    # out[..., o, *ev] = sum_i onehot[..., o, i] * values[..., i, *ev]
    return (oh * values[..., None, :, :] if ev == 1 else
            oh * values[..., None, :]).sum(order.ndim)


def compact_catalog(locs, fluxes, keep):
    """Move kept slots to the front of the object axis, zero the rest.

    ``locs``: ``[..., M, 2]``, ``fluxes``: ``[..., M]``, ``keep``: ``[..., M]``
    bool. Returns ``(counts, locs, fluxes)`` with ``counts = keep.sum(-1)``.

    Stable sort on ``~keep`` preserves the relative order of kept slots
    (the reference's descending sort on an int mask, sampler.py:210-217).
    """
    counts = keep.sum(-1).astype(jnp.int32)
    order = jnp.argsort(~keep, axis=-1, stable=True)
    fluxes = _apply_slot_perm(fluxes * keep, order)
    locs = _apply_slot_perm(locs * keep[..., None], order)
    return counts, locs, fluxes


def prune_catalog(locs, fluxes, *, height, width, flux_threshold, mask=None):
    """Keep detectable, strictly-in-bounds sources and compact.

    Parity: sampler.py:198-219 (``0 < loc < dim`` strictly, flux strictly
    above threshold). ``mask`` optionally restricts to active slots, which
    the reference approximates via zero-valued padding.
    """
    keep = (
        (locs[..., 0] > 0)
        & (locs[..., 0] < height)
        & (locs[..., 1] > 0)
        & (locs[..., 1] < width)
        & (fluxes > flux_threshold)
    )
    if mask is not None:
        keep = keep & mask
    return compact_catalog(locs, fluxes, keep)
