"""Image forward models: PSF render + pixel likelihood (layer L2).

TPU-native re-design of /root/reference/smcdet/images.py:6-175.

The reference renders each star onto a ``(2r+1)^2`` patch and ``scatter_add``s
into a per-star image buffer of shape ``[numH, numW, H, W, n, d]``
(images.py:28-76). Scatter is hostile to TPU; for the small tiles this
framework targets (8x8 .. 32x32 after aggregation joins) a *dense*
evaluation over the full tile is both cheaper (H*W=64 pixels/star vs a
289-pixel patch for r=8) and entirely gather/scatter-free. The patch
truncation is preserved exactly as a mask: pixel ``(h, w)`` receives flux
from a star iff ``|h - floor(loc_h)| <= r`` and ``|w - floor(loc_w)| <= r``
(the reference's patch support, images.py:33-43).

The same class covers both reference image models:

- ``noise="poisson"``  — Poisson pixels with a Normal approximation for
  rates above ``normal_tail_threshold`` (images.py:85-102). This is the
  generic / "basic" model and doubles as the Poisson-likelihood microscopy
  variant.
- ``noise="gaussian"`` — Gaussian pixels with variance
  ``noise_additive + noise_multiplicative * rate`` and nmgy→ADU flux
  calibration (the reference ``M71ImageModel``, images.py:105-175).
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.special import gammaln

from smcdet_tpu.models.psf import GaussianPSF, SDSSPSF

__all__ = ["ImageModel", "M71ImageModel"]

_HALF_LOG_2PI = 0.5 * jnp.log(2.0 * jnp.pi)


@struct.dataclass
class ImageModel:
    """Dense PSF render + pixel likelihood over a ``height x width`` tile.

    ``locs`` convention matches the reference: ``locs[..., 0]`` is the
    height (row) coordinate, ``locs[..., 1]`` the width (column) coordinate,
    and pixel ``(h, w)`` has its centre at ``(h + 0.5, w + 0.5)``
    (images.py:45).
    """

    height: int = struct.field(pytree_node=False)
    width: int = struct.field(pytree_node=False)
    psf_radius: int = struct.field(pytree_node=False)
    noise: str = struct.field(pytree_node=False, default="poisson")
    background: jax.Array = 0.0
    psf: Union[GaussianPSF, SDSSPSF] = None
    # Flux calibration (nmgy -> expected counts); 1.0 for the generic model.
    adu_per_nmgy: jax.Array = 1.0
    # Gaussian-noise variance model: additive + multiplicative * rate.
    noise_additive: jax.Array = 0.0
    noise_multiplicative: jax.Array = 1.0
    # Poisson model switches to a Normal approximation above this rate
    # (images.py:91).
    normal_tail_threshold: float = struct.field(
        pytree_node=False, default=50000.0
    )

    # ------------------------------------------------------------------
    # Rendering
    # ------------------------------------------------------------------
    def star_image(self, loc):
        """Unit-flux PSF image of one star.

        ``loc``: ``[..., 2]`` → returns ``[..., height, width]``. This is
        the workhorse of the incremental (single-component) mutation path:
        moving one star only requires two of these renders instead of a full
        M-star re-render.
        """
        return self.star_image_flat(loc).reshape(
            loc.shape[:-1] + (self.height, self.width)
        )

    def star_image_flat(self, loc):
        """``star_image`` with the pixel axis flattened to ``[..., H*W]``.

        NOTE (TPU layout): hot paths carry pixels flat. A trailing
        ``[..., 8, 8]`` image axis gets its last dim padded to the 128-wide
        lane tile — a 16x memory/bandwidth waste that measured as the
        dominant per-iteration cost; ``[..., 64]`` pads only 2x.
        """
        ly = loc[..., 0][..., None]
        lx = loc[..., 1][..., None]
        p = jnp.arange(self.height * self.width, dtype=jnp.int32)
        h = (p // self.width).astype(jnp.float32)  # [HW]
        w = (p % self.width).astype(jnp.float32)
        dy = (h + 0.5) - ly  # [..., HW]
        dx = (w + 0.5) - lx
        patch = (jnp.abs(h - jnp.floor(ly)) <= self.psf_radius) & (
            jnp.abs(w - jnp.floor(lx)) <= self.psf_radius
        )
        r2 = dy * dy + dx * dx
        return self.psf.normalized(r2) * patch

    def render(self, locs, fluxes):
        """Expected pixel intensities (the Poisson/Gaussian rate).

        ``locs``: ``[..., M, 2]``, ``fluxes``: ``[..., M]`` (inactive slots
        must carry flux 0, which is the padded-catalog convention throughout
        the framework) → ``[..., height, width]``.

        Dense formulation: stars broadcast to ``[..., M, H, W]`` and reduce
        over M; XLA fuses the elementwise PSF evaluation into the reduction,
        so the per-star images are never materialised in HBM.
        """
        eff_flux = jnp.asarray(self.adu_per_nmgy) * fluxes  # [..., M]
        per_star = self.star_image(locs)  # [..., M, H, W]
        rate = (eff_flux[..., None, None] * per_star).sum(-3)
        return rate + jnp.asarray(self.background)

    # ------------------------------------------------------------------
    # Likelihood
    # ------------------------------------------------------------------
    def loglikelihood_from_rate_flat(self, image_flat, rate_flat):
        """Pixelwise log-likelihood over flat pixels, summed over the
        trailing axis (the TPU-friendly layout; see ``star_image_flat``)."""
        return self._pixel_loglik(image_flat, rate_flat).sum(-1)

    def loglikelihood_from_rate(self, image, rate):
        """Pixelwise log-likelihood summed over the tile.

        ``image``: ``[..., H, W]`` broadcastable against ``rate``. Returns
        the sum over the trailing two (pixel) dims.
        """
        return self._pixel_loglik(image, rate).sum((-2, -1))

    def _pixel_loglik(self, image, rate):
        if self.noise == "poisson":
            logpmf = (
                image * jnp.log(rate) - rate - gammaln(image + 1.0)
            )
            # Normal(rate, sqrt(rate)) tail for huge rates (images.py:91-99).
            z2 = (image - rate) ** 2 / rate
            lognorm = -0.5 * z2 - 0.5 * jnp.log(rate) - _HALF_LOG_2PI
            ll = jnp.where(rate > self.normal_tail_threshold, lognorm, logpmf)
        elif self.noise == "gaussian":
            var = (
                jnp.asarray(self.noise_additive)
                + jnp.asarray(self.noise_multiplicative) * rate
            )
            ll = -0.5 * (image - rate) ** 2 / var - 0.5 * jnp.log(var) - (
                _HALF_LOG_2PI
            )
        else:  # pragma: no cover
            raise ValueError(f"unknown noise model {self.noise!r}")
        return ll

    def loglikelihood(self, image, locs, fluxes):
        """``image``: ``[..., H, W]``; catalog ``[..., M(,2)]`` → ``[...]``.

        Parity: images.py:85-102 (Poisson) and :159-175 (Gaussian), except
        that batching is by broadcasting rather than the reference's
        ``[numH, numW, H, W, n, d]`` layout.
        """
        rate = self.render(locs, fluxes)
        return self.loglikelihood_from_rate(image, rate)

    # ------------------------------------------------------------------
    # Simulation
    # ------------------------------------------------------------------
    def sample(self, key, locs, fluxes):
        """Draw a noisy image given a catalog. Parity: images.py:78-83, :147-157."""
        rate = self.render(locs, fluxes)
        if self.noise == "poisson":
            return jax.random.poisson(key, rate).astype(jnp.float32)
        var = (
            jnp.asarray(self.noise_additive)
            + jnp.asarray(self.noise_multiplicative) * rate
        )
        return rate + jnp.sqrt(var) * jax.random.normal(key, rate.shape)


def M71ImageModel(
    image_height: int,
    image_width: int,
    background,
    adu_per_nmgy,
    psf_params,
    psf_radius: int,
    noise_additive=0.0,
    noise_multiplicative=1.0,
) -> ImageModel:
    """Constructor matching the reference ``M71ImageModel`` signature
    (images.py:105-135): SDSS 6-parameter PSF, Gaussian read-noise
    likelihood, nmgy→ADU calibration."""
    return ImageModel(
        height=image_height,
        width=image_width,
        psf_radius=psf_radius,
        noise="gaussian",
        background=jnp.asarray(background, dtype=jnp.float32),
        psf=SDSSPSF.create(psf_params, psf_radius),
        adu_per_nmgy=jnp.asarray(adu_per_nmgy, dtype=jnp.float32),
        noise_additive=jnp.asarray(noise_additive, dtype=jnp.float32),
        noise_multiplicative=jnp.asarray(
            noise_multiplicative, dtype=jnp.float32
        ),
    )
