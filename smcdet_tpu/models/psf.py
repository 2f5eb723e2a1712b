"""Point-spread-function models.

TPU-native re-design of the PSF evaluation in
/root/reference/smcdet/images.py:16-26 (Gaussian) and :105-145 (SDSS
6-parameter double-Gaussian + power-law).

Both PSFs are radially symmetric, so they are parameterised by the *squared*
radius ``r2`` — this avoids a ``sqrt`` per pixel in the hot render path (the
reference computes ``r = ||.||`` and then squares it again internally; the
values are identical).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["GaussianPSF", "SDSSPSF"]


@struct.dataclass
class GaussianPSF:
    """Isotropic Gaussian PSF.

    NOTE (parity): the reference evaluates a *one-dimensional* normal pdf at
    the radius, ``N(r; 0, stdev)`` (images.py:17,25-26) — i.e. the peak value
    is ``1 / (stdev * sqrt(2 pi))``, not the 2-D density — and never
    normalises over the patch. We reproduce that exactly.
    """

    stdev: jax.Array

    def normalized(self, r2):
        stdev = jnp.asarray(self.stdev)
        return jnp.exp(-0.5 * r2 / (stdev * stdev)) / (
            stdev * jnp.sqrt(2.0 * jnp.pi)
        )


@struct.dataclass
class SDSSPSF:
    """SDSS psField 6-parameter PSF: two Gaussians plus a power-law wing.

    ``unnormalized(r2) = (exp(-r2/(2 s1)) + b exp(-r2/(2 s2))
                          + p0 (1 + r2/(beta sp))^(-beta/2)) / (1 + b + p0)``

    The normalising constant is the sum of the unnormalized profile over a
    ``(32 r) x (32 r)`` pixel grid with the star at the grid centre, matching
    /root/reference/smcdet/images.py:122-141 (note the reference's
    ``sigma1``/``sigma2`` already play the role of variances).
    """

    sigma1: jax.Array
    sigma2: jax.Array
    sigmap: jax.Array
    beta: jax.Array
    b: jax.Array
    p0: jax.Array
    normalizing_constant: jax.Array

    @classmethod
    def create(cls, psf_params, psf_radius: int) -> "SDSSPSF":
        sigma1, sigma2, sigmap, beta, b, p0 = (
            jnp.asarray(p, dtype=jnp.float32) for p in psf_params
        )
        unnorm = cls(
            sigma1=sigma1,
            sigma2=sigma2,
            sigmap=sigmap,
            beta=beta,
            b=b,
            p0=p0,
            normalizing_constant=jnp.asarray(1.0, dtype=jnp.float32),
        )
        side = 32 * psf_radius
        # Grid points 0..side-1; star at (side/2, side/2); pixel centres at
        # integer + 0.5 (images.py:123-135).
        coords = jnp.arange(side, dtype=jnp.float32) - (side / 2.0) + 0.5
        r2 = coords[:, None] ** 2 + coords[None, :] ** 2
        const = unnorm.unnormalized(r2).sum()
        return unnorm.replace(normalizing_constant=const)

    def unnormalized(self, r2):
        term1 = jnp.exp(-r2 / (2.0 * self.sigma1))
        term2 = self.b * jnp.exp(-r2 / (2.0 * self.sigma2))
        term3 = self.p0 * (1.0 + r2 / (self.beta * self.sigmap)) ** (
            -self.beta / 2.0
        )
        return (term1 + term2 + term3) / (1.0 + self.b + self.p0)

    def normalized(self, r2):
        return self.unnormalized(r2) / self.normalizing_constant
