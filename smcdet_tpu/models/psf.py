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

# Errors raised when forcing a traced value to a python scalar.
_TRACED_VALUE_ERRORS = (
    TypeError,
    jax.errors.TracerArrayConversionError,
    jax.errors.ConcretizationTypeError,
)


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
    # Static (non-pytree) specialization hint: SDSS psField fits pin the
    # wing exponent at beta = 3, for which the power law is
    # ``(1+x)^(-3/2) = rsqrt((1+x)^3)`` — two multiplies and an rsqrt
    # instead of an exp + log1p PER PIXEL PER RENDER, the largest
    # transcendental cost in the fused sweep kernel (the wing+core
    # renders carry 384 of the ~472 transcendentals/update counted in
    # experiments/roofline.py). Being static, the flag survives jit tracing of the model
    # (it rides the treedef), so the Pallas wrapper can specialize the
    # kernel even though the numeric fields are tracers. ``create`` sets
    # it only from CONCRETE params (under-trace construction — e.g. the
    # LBFGS PSF fit differentiating through ``unnormalized`` — always
    # gets the general path, so d/d(beta) stays exact there).
    wing_beta3: bool = struct.field(pytree_node=False, default=False)

    def __post_init__(self):
        # Loud-fail drift guard (ADVICE r4): the flag is a cached predicate
        # of ``beta``; ``replace(beta=...)`` or direct construction with a
        # stale True flag would silently render the wrong wing profile.
        # With a concrete beta we can check; a traced beta (jit
        # reconstruction) inherited the flag from a concrete ``create``.
        if self.wing_beta3:
            try:
                ok = abs(float(self.beta) - 3.0) < 1e-6
            except _TRACED_VALUE_ERRORS:
                return
            if not ok:
                raise ValueError(
                    "SDSSPSF.wing_beta3 is set but beta="
                    f"{float(self.beta)} != 3; construct via SDSSPSF.create "
                    "(or clear the flag) so the wing specialization stays "
                    "consistent"
                )

    @classmethod
    def create(cls, psf_params, psf_radius: int) -> "SDSSPSF":
        sigma1, sigma2, sigmap, beta, b, p0 = (
            jnp.asarray(p, dtype=jnp.float32) for p in psf_params
        )
        try:
            wing_beta3 = abs(float(psf_params[3]) - 3.0) < 1e-6
        except _TRACED_VALUE_ERRORS:  # traced beta: cannot specialize
            wing_beta3 = False
        unnorm = cls(
            sigma1=sigma1,
            sigma2=sigma2,
            sigmap=sigmap,
            beta=beta,
            b=b,
            p0=p0,
            normalizing_constant=jnp.asarray(1.0, dtype=jnp.float32),
            wing_beta3=wing_beta3,
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
        q = 1.0 + r2 / (self.beta * self.sigmap)
        if self.wing_beta3:
            # (1+x)^(-3/2) without pow/exp/log (see the field docstring)
            term3 = self.p0 * jax.lax.rsqrt(q * q * q)
        else:
            term3 = self.p0 * q ** (-self.beta / 2.0)
        return (term1 + term2 + term3) / (1.0 + self.b + self.p0)

    def normalized(self, r2):
        return self.unnormalized(r2) / self.normalizing_constant
