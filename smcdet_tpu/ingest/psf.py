"""PSF image synthesis from survey parameters.

Replaces the galsim-backed ``ImagePSF``
(/root/reference/experiments/m71/survey_utils/psf.py:17-79): the 6-param
SDSS profile is evaluated directly on a ``psf_slen x psf_slen`` grid and
normalised to unit flux; continuous evaluation at arbitrary offsets (what
the reference got from ``galsim.InterpolatedImage``) comes from evaluating
the radial profile itself, which is exact rather than interpolated.
"""

from __future__ import annotations

import numpy as np

__all__ = ["PSFConfig", "sdss_psf_profile", "render_psf_image", "ImagePSF"]


def PSFConfig(pixel_scale: float, psf_slen: int) -> dict:
    return {"pixel_scale": pixel_scale, "psf_slen": psf_slen}


def sdss_psf_profile(r, sigma1, sigma2, sigmap, beta, b, p0):
    """SDSS psField 2-Gaussian + power-law profile at radius ``r``
    (psf.py:... / sdss.py:504-526; the sigma* parameters are the squared
    widths, as loaded by ``read_psf_params``)."""
    r2 = np.asarray(r, dtype=np.float64) ** 2
    term1 = np.exp(-r2 / (2.0 * sigma1))
    term2 = b * np.exp(-r2 / (2.0 * sigma2))
    term3 = p0 * (1.0 + r2 / (beta * sigmap)) ** (-beta / 2.0)
    return (term1 + term2 + term3) / (1.0 + b + p0)


def render_psf_image(params, psf_slen: int) -> np.ndarray:
    """Normalised ``psf_slen x psf_slen`` PSF image for one band's params
    (psf.py:23-47: odd side, star at the centre pixel)."""
    assert psf_slen % 2 == 1, "psf_slen must be odd"
    offset = (psf_slen - 1) / 2
    grid = np.arange(psf_slen, dtype=np.float64) - offset
    r = np.hypot(grid[:, None], grid[None, :])
    img = sdss_psf_profile(r, *np.asarray(params, dtype=np.float64))
    return (img / img.sum()).astype(np.float32)


class ImagePSF:
    """Multi-band PSF bundle with continuous evaluation.

    ``psf_params``: ``[n_bands, 6]``. ``image(band)`` gives the discrete
    normalised stamp; ``at(band, dy, dx)`` evaluates the continuous
    profile (unit total flux over the stamp grid) at offsets from centre.
    """

    def __init__(self, psf_params, pixel_scale: float = 0.396,
                 psf_slen: int = 25):
        self.psf_params = np.asarray(psf_params, dtype=np.float64)
        self.pixel_scale = pixel_scale
        self.psf_slen = psf_slen
        self._norms = [
            sdss_psf_profile(
                np.hypot(*np.meshgrid(
                    np.arange(psf_slen) - (psf_slen - 1) / 2,
                    np.arange(psf_slen) - (psf_slen - 1) / 2,
                )),
                *p,
            ).sum()
            for p in self.psf_params
        ]

    @property
    def n_bands(self):
        return self.psf_params.shape[0]

    def image(self, band: int) -> np.ndarray:
        return render_psf_image(self.psf_params[band], self.psf_slen)

    def at(self, band: int, dy, dx) -> np.ndarray:
        r = np.hypot(np.asarray(dy), np.asarray(dx))
        return (
            sdss_psf_profile(r, *self.psf_params[band]) / self._norms[band]
        )
