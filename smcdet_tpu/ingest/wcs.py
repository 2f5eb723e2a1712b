"""TAN (gnomonic) world coordinate system, implemented directly.

Replaces ``astropy.wcs.WCS`` for the slice survey ingestion uses
(/root/reference/experiments/m71/survey_utils/sdss.py:227-229,
catalog.py:395-417): converting between (RA, DEC) degrees and pixel
coordinates of SDSS frames, whose headers carry the standard
CRPIX/CRVAL/CD TAN keywords.

Conventions:
- ``world2pix``/``pix2world`` use FITS 0-based pixel coordinates in
  (x, y) = (column, row) order, matching ``astropy`` with ``origin=0``.
- ``plocs_from_ra_dec`` returns the reference's BLISS-style coordinates:
  (row, col) order with a +0.5 shift so (0, 0) is the image corner
  (catalog.py:395-417).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["TanWCS", "plocs_from_ra_dec"]

DEG = np.pi / 180.0


@dataclass(frozen=True)
class TanWCS:
    crpix: np.ndarray  # [2] 0-based reference pixel (x, y)
    crval: np.ndarray  # [2] (ra0, dec0) degrees at the reference pixel
    cd: np.ndarray  # [2, 2] linear transform pixel -> intermediate degrees
    # True if header axis 1 is RA (CTYPE1='RA---TAN'); False if swapped.
    ra_first: bool = True

    @classmethod
    def from_header(cls, header: dict) -> "TanWCS":
        ctype1 = str(header.get("CTYPE1", "RA---TAN"))
        ra_first = ctype1.upper().startswith("RA")
        crpix = np.asarray(
            [header["CRPIX1"] - 1.0, header["CRPIX2"] - 1.0]
        )  # FITS CRPIX is 1-based
        crval = np.asarray([header["CRVAL1"], header["CRVAL2"]])
        if "CD1_1" in header:
            cd = np.asarray(
                [
                    [header["CD1_1"], header.get("CD1_2", 0.0)],
                    [header.get("CD2_1", 0.0), header["CD2_2"]],
                ]
            )
        else:  # CDELT (+ optional PC matrix)
            cdelt = np.asarray([header["CDELT1"], header["CDELT2"]])
            pc = np.asarray(
                [
                    [header.get("PC1_1", 1.0), header.get("PC1_2", 0.0)],
                    [header.get("PC2_1", 0.0), header.get("PC2_2", 1.0)],
                ]
            )
            cd = pc * cdelt[:, None]
        if not ra_first:
            # normalise to RA-first intermediate coords
            cd = cd[::-1]
            crval = crval[::-1]
        return cls(crpix=crpix, crval=crval, cd=cd, ra_first=ra_first)

    # ------------------------------------------------------------------
    def pix2world(self, x, y):
        """0-based pixel (x=col, y=row) -> (ra, dec) degrees."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        dp = np.stack([x - self.crpix[0], y - self.crpix[1]], axis=-1)
        interm = dp @ self.cd.T  # degrees, [..., 2] = (xi_ra, eta_dec)
        xi = interm[..., 0] * DEG
        eta = interm[..., 1] * DEG

        ra0 = self.crval[0] * DEG
        dec0 = self.crval[1] * DEG
        rho = np.hypot(xi, eta)
        c = np.arctan(rho)
        cos_c, sin_c = np.cos(c), np.sin(c)
        with np.errstate(invalid="ignore", divide="ignore"):
            dec = np.arcsin(
                np.where(
                    rho > 0,
                    cos_c * np.sin(dec0) + eta * sin_c * np.cos(dec0) / rho,
                    np.sin(dec0),
                )
            )
            ra = ra0 + np.arctan2(
                xi * sin_c,
                rho * np.cos(dec0) * cos_c - eta * np.sin(dec0) * sin_c,
            )
        return (ra / DEG) % 360.0, dec / DEG

    def world2pix(self, ra, dec):
        """(ra, dec) degrees -> 0-based pixel (x=col, y=row)."""
        ra = np.asarray(ra, dtype=np.float64) * DEG
        dec = np.asarray(dec, dtype=np.float64) * DEG
        ra0 = self.crval[0] * DEG
        dec0 = self.crval[1] * DEG

        dra = ra - ra0
        cos_c = np.sin(dec0) * np.sin(dec) + np.cos(dec0) * np.cos(
            dec
        ) * np.cos(dra)
        xi = np.cos(dec) * np.sin(dra) / cos_c
        eta = (
            np.cos(dec0) * np.sin(dec)
            - np.sin(dec0) * np.cos(dec) * np.cos(dra)
        ) / cos_c
        interm = np.stack([xi / DEG, eta / DEG], axis=-1)
        dp = interm @ np.linalg.inv(self.cd).T
        return dp[..., 0] + self.crpix[0], dp[..., 1] + self.crpix[1]

    # astropy-compatible aliases used by the reference
    def all_world2pix(self, ra, dec, origin=0):
        x, y = self.world2pix(ra, dec)
        return x + origin * 0.0, y + origin * 0.0

    def all_pix2world(self, x, y, origin=0):
        return self.pix2world(np.asarray(x) - origin * 0, np.asarray(y))


def plocs_from_ra_dec(ras, decs, wcs: TanWCS):
    """RA/DEC -> BLISS-style (row, col) pixel coords with the +0.5 corner
    shift. Parity: catalog.py:395-417."""
    pt, pr = wcs.all_world2pix(np.asarray(ras), np.asarray(decs), 0)
    return np.stack([pr + 0.5, pt + 0.5], axis=-1)
