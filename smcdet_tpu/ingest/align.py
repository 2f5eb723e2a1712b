"""Cross-band image alignment via WCS reprojection.

Replaces ``reproject.reproject_interp``
(/root/reference/experiments/m71/survey_utils/align.py:5-46): each band is
resampled onto the reference band's WCS by mapping every target pixel
through target-WCS -> sky -> source-WCS and sampling the source image
bicubically (Catmull-Rom, the same kernel family reproject's "bicubic"
order uses). Out-of-footprint pixels are zeroed across all bands so every
band shares an identical footprint, matching the reference's joint
footprint product (align.py:32-43).
"""

from __future__ import annotations

import numpy as np

__all__ = ["align", "bicubic_sample"]


def _cubic_kernel(t):
    """Catmull-Rom cubic (a = -0.5)."""
    a = -0.5
    t = np.abs(t)
    t2, t3 = t * t, t * t * t
    return np.where(
        t <= 1.0,
        (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0,
        np.where(t < 2.0, a * t3 - 5.0 * a * t2 + 8.0 * a * t - 4.0 * a, 0.0),
    )


def bicubic_sample(image, y, x):
    """Sample ``image`` at fractional (y, x); returns (values, inside)."""
    H, W = image.shape
    y0 = np.floor(y).astype(int)
    x0 = np.floor(x).astype(int)
    inside = (y >= 1) & (y < H - 2) & (x >= 1) & (x < W - 2)
    ys = np.clip(y0, 1, H - 3)
    xs = np.clip(x0, 1, W - 3)

    out = np.zeros_like(y, dtype=np.float64)
    for j in range(-1, 3):
        wy = _cubic_kernel(y - (ys + j))
        for i in range(-1, 3):
            wx = _cubic_kernel(x - (xs + i))
            out += wy * wx * image[ys + j, xs + i]
    return out, inside


def align(img, wcs_list, ref_band: int, ref_depth: int = 0):
    """Reproject all bands onto ``wcs_list[ref_band]``'s pixel grid.

    ``img``: ``[n_bands, H, W]`` (or ``[depth, n_bands, H, W]``);
    ``wcs_list``: matching list (of lists) of ``TanWCS``. Returns float32
    with the joint footprint applied, like align.py:5-46.
    """
    img = np.asarray(img, dtype=np.float64)
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    if not isinstance(wcs_list[0], (list, tuple)):
        wcs_list = [wcs_list]
    depth, n_bands, H, W = img.shape

    target = wcs_list[ref_depth][ref_band]
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    ra, dec = target.pix2world(xx.ravel(), yy.ravel())

    out = np.zeros_like(img)
    footprint = np.ones((H, W), dtype=bool)
    samples = {}
    for d in range(depth):
        for b in range(n_bands):
            src = wcs_list[d][b]
            sx, sy = src.world2pix(ra, dec)
            vals, inside = bicubic_sample(
                img[d, b], sy.reshape(H, W), sx.reshape(H, W)
            )
            samples[(d, b)] = vals
            footprint &= inside
    for key, vals in samples.items():
        out[key] = np.where(footprint, vals, 0.0)
    if squeeze:
        out = out[0]
    return out.astype(np.float32)
