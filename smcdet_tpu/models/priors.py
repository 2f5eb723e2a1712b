"""Marked-point-process priors over (counts, locations, fluxes) (layer L2).

TPU-native re-design of /root/reference/smcdet/prior.py:8-226.

Differences from the reference, by design:

- Catalogs are fixed-shape padded arrays with an *explicit* activity rule:
  slot ``m`` of a catalog is active iff ``m < count``. The reference infers
  emptiness from ``value != 0``, which conflates a true coordinate/flux of
  exactly 0 with an empty slot (prior.py:62, :224); we zero inactive slots
  for hygiene but never branch on it.
- Count-stratified sampling returns a dense stratum axis
  ``[..., C, N, M, ...]`` rather than strata concatenated along the particle
  axis (prior.py:47-54); per-stratum reductions are then plain axis
  reductions instead of ragged ``torch.split`` lists.
- Count and flux families are composed (``counts=...``, ``flux=...``)
  instead of subclass overrides; constructor functions with the reference
  class names are provided for familiarity.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.special import gammaln

from smcdet_tpu.distributions import TruncatedPareto

__all__ = [
    "UniformCounts",
    "PoissonCounts",
    "GeometricCounts",
    "NormalFlux",
    "ParetoFlux",
    "PointProcessPrior",
    "PoissonProcessPrior",
    "GeometricProcessPrior",
    "StarPrior",
    "ParetoStarPrior",
    "M71Prior",
]


# ----------------------------------------------------------------------
# Count distributions
# ----------------------------------------------------------------------
@struct.dataclass
class UniformCounts:
    """Integer-uniform count prior (prior.py:19)."""

    low: int = struct.field(pytree_node=False)
    high: int = struct.field(pytree_node=False)

    def sample(self, key, shape=()):
        return jax.random.randint(key, shape, self.low, self.high + 1)

    def log_prob(self, value):
        value = jnp.asarray(value)
        in_support = (value >= self.low) & (value <= self.high)
        return jnp.where(
            in_support, -jnp.log(float(self.high - self.low + 1)), -jnp.inf
        )


@struct.dataclass
class PoissonCounts:
    """Poisson count prior with rate ``mu * padded_area`` (prior.py:91-97)."""

    rate: jax.Array

    def sample(self, key, shape=()):
        return jax.random.poisson(key, jnp.asarray(self.rate), shape)

    def log_prob(self, value):
        value = jnp.asarray(value, dtype=jnp.float32)
        rate = jnp.asarray(self.rate)
        return value * jnp.log(rate) - rate - gammaln(value + 1.0)


@struct.dataclass
class GeometricCounts:
    """Geometric count prior, ``p = 1 - exp(-1.5)`` per Feder et al. 2020
    (prior.py:114-118). pmf(k) = (1-p)^k p for k = 0, 1, ..."""

    prob: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(1.0 - jnp.exp(-1.5))
    )

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape)
        p = jnp.asarray(self.prob)
        return jnp.floor(jnp.log1p(-u) / jnp.log1p(-p)).astype(jnp.int32)

    def log_prob(self, value):
        value = jnp.asarray(value, dtype=jnp.float32)
        p = jnp.asarray(self.prob)
        return value * jnp.log1p(-p) + jnp.log(p)


# ----------------------------------------------------------------------
# Flux (mark) distributions
# ----------------------------------------------------------------------
@struct.dataclass
class NormalFlux:
    """Normal flux mark (prior.py:130)."""

    mean: jax.Array
    stdev: jax.Array

    def sample(self, key, shape=()):
        return jnp.asarray(self.mean) + jnp.asarray(
            self.stdev
        ) * jax.random.normal(key, shape)

    def log_prob(self, value):
        mean = jnp.asarray(self.mean)
        stdev = jnp.asarray(self.stdev)
        z = (value - mean) / stdev
        return -0.5 * z * z - jnp.log(stdev) - 0.5 * jnp.log(2.0 * jnp.pi)

    @property
    def reference_point(self):
        return jnp.asarray(self.mean)

    @property
    def support_lower(self):
        return jnp.asarray(-jnp.inf)

    @property
    def support_upper(self):
        return jnp.asarray(jnp.inf)


@struct.dataclass
class ParetoFlux:
    """Pareto flux mark with scale (minimum) and shape alpha (prior.py:162)."""

    scale: jax.Array
    alpha: jax.Array

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape)
        scale = jnp.asarray(self.scale)
        alpha = jnp.asarray(self.alpha)
        return scale * (1.0 - u) ** (-1.0 / alpha)

    def log_prob(self, value):
        scale = jnp.asarray(self.scale)
        alpha = jnp.asarray(self.alpha)
        return (
            jnp.log(alpha) + alpha * jnp.log(scale) - (alpha + 1.0) * jnp.log(value)
        )

    @property
    def reference_point(self):
        return jnp.asarray(self.scale)

    @property
    def support_lower(self):
        return jnp.asarray(self.scale)

    @property
    def support_upper(self):
        return jnp.asarray(jnp.inf)


# TruncatedPareto (distributions.py) already provides sample/log_prob; give it
# the reference-point hook used to evaluate masked slots safely.
def _truncated_pareto_reference_point(self):
    return jnp.asarray(self.lower)


TruncatedPareto.reference_point = property(_truncated_pareto_reference_point)
TruncatedPareto.support_lower = property(_truncated_pareto_reference_point)
TruncatedPareto.support_upper = property(
    lambda self: jnp.asarray(self.upper)
)


# ----------------------------------------------------------------------
# The marked point-process prior
# ----------------------------------------------------------------------
@struct.dataclass
class PointProcessPrior:
    """Prior over padded catalogs on a ``height x width`` tile with ``pad``
    pixels of slack on every side: ``loc ~ U([-pad, H+pad] x [-pad, W+pad])``
    (prior.py:20-23)."""

    min_objects: int = struct.field(pytree_node=False)
    max_objects: int = struct.field(pytree_node=False)
    image_height: int = struct.field(pytree_node=False)
    image_width: int = struct.field(pytree_node=False)
    pad: float = struct.field(pytree_node=False, default=0.0)
    counts: Any = None
    flux: Optional[Any] = None

    @property
    def num_counts(self) -> int:
        return self.max_objects - self.min_objects + 1

    @property
    def loc_low(self):
        return jnp.asarray([-self.pad, -self.pad], dtype=jnp.float32)

    @property
    def loc_high(self):
        return jnp.asarray(
            [self.image_height + self.pad, self.image_width + self.pad],
            dtype=jnp.float32,
        )

    def slot_mask(self, counts):
        """Active-slot mask: ``[..., M]`` bool with slot m active iff
        ``m < count``."""
        m = jnp.arange(self.max_objects)
        return m < counts[..., None]

    # ------------------------------------------------------------------
    def sample_marks(self, key, counts, batch_shape):
        """Draw (locs, fluxes) given counts of shape ``batch_shape``."""
        key_locs, key_flux = jax.random.split(key)
        mask = self.slot_mask(counts)
        shape = tuple(batch_shape) + (self.max_objects,)
        locs = self.loc_low + (self.loc_high - self.loc_low) * (
            jax.random.uniform(key_locs, shape + (2,))
        )
        locs = locs * mask[..., None]
        if self.flux is None:
            return locs, None
        fluxes = self.flux.sample(key_flux, shape) * mask
        return locs, fluxes

    def sample(self, key, num_catalogs, batch_shape=()):
        """Unstratified draw: counts ``[*B, N]``, locs ``[*B, N, M, 2]``,
        fluxes ``[*B, N, M]``. Counts are clipped to the supported range
        ``[min_objects, max_objects]`` (the reference instead indexes
        ``arange(min, max+1)`` by the raw draw, prior.py:43-46)."""
        key_counts, key_marks = jax.random.split(key)
        shape = tuple(batch_shape) + (num_catalogs,)
        counts = jnp.clip(
            self.counts.sample(key_counts, shape),
            self.min_objects,
            self.max_objects,
        ).astype(jnp.int32)
        locs, fluxes = self.sample_marks(key_marks, counts, shape)
        return counts, locs, fluxes

    def sample_stratified(self, key, num_catalogs_per_count, batch_shape=()):
        """Count-stratified draw with a dense stratum axis C:

        counts ``[C]`` (constant per stratum), locs ``[*B, C, N, M, 2]``,
        fluxes ``[*B, C, N, M]``. Parity: prior.py:47-62 modulo layout.
        """
        strata = jnp.arange(
            self.min_objects, self.max_objects + 1, dtype=jnp.int32
        )
        shape = tuple(batch_shape) + (self.num_counts, num_catalogs_per_count)
        counts = jnp.broadcast_to(strata[:, None], shape[-2:])
        counts = jnp.broadcast_to(counts, shape)
        locs, fluxes = self.sample_marks(key, counts, shape)
        return strata, locs, fluxes

    # ------------------------------------------------------------------
    def count_log_prob_truncated(self, counts):
        """Count log-pmf renormalised over ``{min_objects..max_objects}``;
        used to seed the per-stratum log normalising constants of CS-SMC."""
        support = jnp.arange(
            self.min_objects, self.max_objects + 1, dtype=jnp.int32
        )
        log_norm = jax.scipy.special.logsumexp(self.counts.log_prob(support))
        return self.counts.log_prob(counts) - log_norm

    def loc_log_prob(self, locs, mask):
        """Sum of per-active-slot uniform loc terms."""
        area_term = jnp.log(self.loc_high - self.loc_low).sum()
        return -area_term * mask.sum(-1).astype(jnp.float32)

    def flux_log_prob(self, fluxes, mask):
        """Sum of per-active-slot flux terms, safe on padded (zero) slots."""
        if self.flux is None:
            return jnp.zeros(fluxes.shape[:-1] if fluxes is not None else ())
        safe = jnp.where(mask, fluxes, self.flux.reference_point)
        return jnp.where(mask, self.flux.log_prob(safe), 0.0).sum(-1)

    def log_prob(self, counts, locs, fluxes=None):
        """Joint prior log-density of a padded catalog.

        Parity: prior.py:67-75 and the per-family flux terms (:151-154,
        :183-189, :220-226); inactive slots contribute nothing via the mask
        rather than the reference's ``fluxes + lower * (fluxes == 0)`` hack.
        """
        mask = self.slot_mask(counts)
        lp = self.counts.log_prob(counts) + self.loc_log_prob(locs, mask)
        if self.flux is not None and fluxes is not None:
            lp = lp + self.flux_log_prob(fluxes, mask)
        return lp

    # Conditional (within-stratum) log-density, constant in the count term;
    # useful for MH targets where the count is fixed.
    def log_prob_marks(self, counts, locs, fluxes=None):
        mask = self.slot_mask(counts)
        lp = self.loc_log_prob(locs, mask)
        if self.flux is not None and fluxes is not None:
            lp = lp + self.flux_log_prob(fluxes, mask)
        return lp


# ----------------------------------------------------------------------
# Reference-named constructors (prior.py:78-226)
# ----------------------------------------------------------------------
def PoissonProcessPrior(
    min_objects, max_objects, counts_rate, image_height, image_width, pad=0.0
):
    rate = counts_rate * (image_height + 2 * pad) * (image_width + 2 * pad)
    return PointProcessPrior(
        min_objects=min_objects,
        max_objects=max_objects,
        image_height=image_height,
        image_width=image_width,
        pad=pad,
        counts=PoissonCounts(rate=jnp.asarray(rate, dtype=jnp.float32)),
    )


def GeometricProcessPrior(
    min_objects, max_objects, image_height, image_width, pad=0.0
):
    return PointProcessPrior(
        min_objects=min_objects,
        max_objects=max_objects,
        image_height=image_height,
        image_width=image_width,
        pad=pad,
        counts=GeometricCounts(),
    )


def StarPrior(
    min_objects,
    max_objects,
    image_height,
    image_width,
    flux_mean,
    flux_stdev,
    pad=0.0,
):
    return PointProcessPrior(
        min_objects=min_objects,
        max_objects=max_objects,
        image_height=image_height,
        image_width=image_width,
        pad=pad,
        counts=UniformCounts(low=min_objects, high=max_objects),
        flux=NormalFlux(
            mean=jnp.asarray(flux_mean, dtype=jnp.float32),
            stdev=jnp.asarray(flux_stdev, dtype=jnp.float32),
        ),
    )


def ParetoStarPrior(
    min_objects,
    max_objects,
    image_height,
    image_width,
    flux_scale,
    flux_alpha,
    pad=0.0,
):
    return PointProcessPrior(
        min_objects=min_objects,
        max_objects=max_objects,
        image_height=image_height,
        image_width=image_width,
        pad=pad,
        counts=UniformCounts(low=min_objects, high=max_objects),
        flux=ParetoFlux(
            scale=jnp.asarray(flux_scale, dtype=jnp.float32),
            alpha=jnp.asarray(flux_alpha, dtype=jnp.float32),
        ),
    )


def M71Prior(
    min_objects,
    max_objects,
    counts_rate,
    image_height,
    image_width,
    flux_alpha,
    flux_lower,
    flux_upper,
    pad=0.0,
):
    rate = counts_rate * (image_height + 2 * pad) * (image_width + 2 * pad)
    return PointProcessPrior(
        min_objects=min_objects,
        max_objects=max_objects,
        image_height=image_height,
        image_width=image_width,
        pad=pad,
        counts=PoissonCounts(rate=jnp.asarray(rate, dtype=jnp.float32)),
        flux=TruncatedPareto(
            alpha=jnp.asarray(flux_alpha, dtype=jnp.float32),
            lower=jnp.asarray(flux_lower, dtype=jnp.float32),
            upper=jnp.asarray(flux_upper, dtype=jnp.float32),
        ),
    )
