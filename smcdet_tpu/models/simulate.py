"""Synthetic-image simulator (parity: /root/reference/smcdet/images.py:178-228).

Draw catalogs from a prior, render + add noise with an image model, and
report both the raw catalogs and the "detectable" catalogs (sources strictly
inside the image with flux above threshold, compacted to the front of the
object axis).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from smcdet_tpu.ops.catalogs import compact_catalog, slot_mask

__all__ = ["SimulatedImages", "generate_images"]


class SimulatedImages(NamedTuple):
    unpruned_counts: jax.Array  # [n]
    unpruned_locs: jax.Array  # [n, M, 2]
    unpruned_fluxes: jax.Array  # [n, M]
    pruned_counts: jax.Array  # [n]
    pruned_locs: jax.Array  # [n, M, 2]
    pruned_fluxes: jax.Array  # [n, M]
    images: jax.Array  # [n, H, W]


def generate_images(
    key,
    prior,
    image_model,
    flux_threshold,
    loc_threshold_lower,
    loc_threshold_upper,
    num_images: int = 1,
) -> SimulatedImages:
    """Simulate ``num_images`` tiles from the generative model.

    The prune rule matches images.py:191-198: every loc coordinate strictly
    inside ``(loc_threshold_lower, loc_threshold_upper)`` and flux strictly
    above ``flux_threshold`` — with the activity mask applied explicitly
    rather than via the zero-padding convention.
    """
    key_prior, key_image = jax.random.split(key)
    counts, locs, fluxes = prior.sample(key_prior, num_images)
    images = image_model.sample(key_image, locs, fluxes)

    active = slot_mask(counts, prior.max_objects)
    keep = (
        jnp.all(
            (locs > loc_threshold_lower) & (locs < loc_threshold_upper),
            axis=-1,
        )
        & (fluxes > flux_threshold)
        & active
    )
    pruned_counts, pruned_locs, pruned_fluxes = compact_catalog(
        locs, fluxes, keep
    )

    return SimulatedImages(
        unpruned_counts=counts,
        unpruned_locs=locs,
        unpruned_fluxes=fluxes,
        pruned_counts=pruned_counts,
        pruned_locs=pruned_locs,
        pruned_fluxes=pruned_fluxes,
        images=images,
    )
