#!/usr/bin/env python
"""Offline M71 archive stand-in (see NETWORK.md for why).

Network egress is blocked in this environment and the reference repo ships
no data bytes, so this script synthesizes the complete SDSS + Hubble
product set that ``prepare_data.py --no-download`` consumes, at the
fidelity of the real field:

- a full 1489x2048 5-band SDSS frame set (run 6895 / camcol 3 / field 52
  layout) with TAN WCS, per-column flux calibration, spatially varying
  ALLSKY background grid, and photoField gains — written through the
  framework's own FITS layer (ingest/fits.py), byte-layout compatible
  with the real archive products (reference survey_utils/sdss.py:198-239);
- a psField file whose HDU-6 PSF parameters are a *perturbed* estimate of
  the generating PSF (the LBFGS fit must genuinely refine them, mirroring
  m71.ipynb cells 86-94 where the psField values seed the fit);
- a Hubble ACSGGCT-style ``.zpt`` catalog (3 header lines, 23 whitespace
  columns, col 9 = mag, cols 21/22 = RA/DEC) listing every generated star
  with small astrometric/photometric scatter.

The stellar field follows the manuscript's fitted M71 model
(manuscript.tex:564): homogeneous Poisson density mu = 0.030 stars/px
over the 320x160 target region (plus the off-region fit patch),
truncated-Pareto fluxes alpha = 0.214 on [0.252, 1804.679] nmgy, the SDSS
6-parameter PSF, Gaussian noise with var = sigma0 + 1.94 * rate
(electron units throughout, like ingest/sdss.read_frame). The Pareto
tail naturally yields bright giants whose tiles exceed the 60000-count
saturation threshold and get masked, as in the real field.

Rendering uses the exact patch-truncated PSF profile of
``models/imaging.py:92-103`` (radius-8 17x17 patches, pixel centres at
+0.5), so downstream inference is *well-specified* by default — this
validates the full pipeline. ``--psf-misspec {elliptical,varying}``
instead renders with a PSF *outside* the circular 6-parameter inference
family (same seed => identical star field), reproducing the mechanism of
the reference's real-data PSF-misspecification finding offline
(manuscript.tex:686-688; the real bytes are unreachable, NETWORK.md).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from smcdet_tpu.ingest import fits  # noqa: E402
from smcdet_tpu.ingest.wcs import TanWCS  # noqa: E402

RUN, CAMCOL, FIELD = 6895, 3, 52
FRAME_H, FRAME_W = 1489, 2048
BANDS = ("u", "g", "r", "i", "z")
RBAND = 2
GAINS = np.asarray([1.62, 3.32, 4.7, 5.16, 4.72], dtype=np.float32)

# target region + fit patch (prepare_data.py conventions)
REGION_Y0, REGION_X0, REGION_H, REGION_W = 900, 1728, 320, 160
FIT_Y0, FIT_X0, FIT_HW = REGION_Y0 - 96, REGION_X0, 64

# generating model (manuscript.tex:564 fitted values)
MU_PER_PX = 0.030
FLUX_ALPHA, FLUX_LOWER, FLUX_UPPER = 0.214, 0.252, 1804.679
TRUE_PSF = (1.51, 4.85, 1.32, 3.0, 0.09, 0.002)  # squared-sigma convention
PSF_RADIUS = 8
NOISE_MULT, NOISE_ADD = 1.94, 0.01
CALIB_NMGY_PER_COUNT = GAINS[RBAND] / 856.0  # => nelec_per_nmgy = 856.0
SKY_COUNTS = 184.0  # * gain 4.7 => ~865 e- mean background

WCS_CARDS = {
    "CTYPE1": "RA---TAN",
    "CTYPE2": "DEC--TAN",
    "CRPIX1": 1024.0,
    "CRPIX2": 744.0,
    "CRVAL1": 298.44,
    "CRVAL2": 18.78,
    "CD1_1": -6.0e-6,
    "CD1_2": 1.09e-4,
    "CD2_1": 1.09e-4,
    "CD2_2": 6.0e-6,
}


def sample_truncated_pareto(rng, n, alpha=FLUX_ALPHA, lo=FLUX_LOWER,
                            hi=FLUX_UPPER):
    """Inverse-CDF truncated-Pareto draw (distributions.py semantics)."""
    u = rng.uniform(size=n)
    la, ua = lo**-alpha, hi**-alpha
    return (la - u * (la - ua)) ** (-1.0 / alpha)


def sdss_psf_unnorm(r2, params=TRUE_PSF):
    """The 6-parameter SDSS profile (models/psf.SDSSPSF formula)."""
    s1, s2, sp, beta, b, p0 = params
    t1 = np.exp(-r2 / (2.0 * s1))
    t2 = b * np.exp(-r2 / (2.0 * s2))
    t3 = p0 * (1.0 + r2 / (beta * sp)) ** (-beta / 2.0)
    return (t1 + t2 + t3) / (1.0 + b + p0)


def sdss_psf_normalized(r2, params=TRUE_PSF, radius=PSF_RADIUS):
    """models/psf.SDSSPSF.normalized in numpy (identical formula + the
    32r x 32r-grid normalising constant, reference images.py:122-141)."""
    side = 32 * radius
    coords = np.arange(side, dtype=np.float64) - side / 2.0 + 0.5
    const = sdss_psf_unnorm(
        coords[:, None] ** 2 + coords[None, :] ** 2, params
    ).sum()
    return sdss_psf_unnorm(r2, params) / const


# --- misspecified rendering PSFs (outside the inference family) ---------
# Mechanism study for the reference's real-data finding: spurious
# intermediate-magnitude detections + poorly calibrated total fluxes,
# theorized to come from the 6-parameter circular PSF being "not flexible
# enough" or its parameters "vary[ing] across M71"
# (/root/reference/manuscript/manuscript.tex:686-688). Both theorized
# mechanisms are available:
#  - "elliptical": a fixed anisotropic metric q*u^2 + v^2/q at angle
#    THETA. The inference family is circularly symmetric, so no parameter
#    setting can absorb the azimuthal structure.
#  - "varying": circular profile whose core VARIANCES (the s1/s2 fields
#    of the squared-sigma convention) drift linearly by +-VARY_FRAC
#    across the target region — i.e. width drift sqrt(1 +- 0.15) ~
#    +-7.2% — while the off-region fit patch sits at the -15% end, so a
#    single MLE is wrong for most cutouts.
ELL_Q = 1.15
ELL_THETA = np.deg2rad(30.0)
VARY_FRAC = 0.15


def elliptical_metric(dy, dx, q=ELL_Q, theta=ELL_THETA):
    c, s = np.cos(theta), np.sin(theta)
    u = c * dy + s * dx
    v = -s * dy + c * dx
    return q * u**2 + v**2 / q


def psf_eval_factory(misspec):
    """Returns psf(dy, dx, row, col) -> normalized patch values.

    The normalising constant is recomputed on the same distorted metric
    (32r x 32r grid) so total rendered flux stays calibrated — the
    misspecification is purely in the SHAPE, not the photometric scale.
    """
    side = 32 * PSF_RADIUS
    coords = np.arange(side, dtype=np.float64) - side / 2.0 + 0.5
    gy, gx = coords[:, None], coords[None, :]

    if misspec == "none":

        def psf(dy, dx, row, col):
            return sdss_psf_normalized(dy[:, None] ** 2 + dx[None, :] ** 2)

    elif misspec == "elliptical":
        const = sdss_psf_unnorm(elliptical_metric(gy, gx)).sum()

        def psf(dy, dx, row, col):
            m = elliptical_metric(dy[:, None], dx[None, :])
            return sdss_psf_unnorm(m) / const

    elif misspec == "varying":

        # NOTE: the normalising constant is recomputed on the 256x256
        # grid per star (scale varies continuously with row, so consts
        # cannot be shared without quantising — which would change the
        # committed render). ~65k evaluations x ~2k stars ~ a few
        # minutes of one-time fixture generation; exactness wins.
        def psf(dy, dx, row, col):
            # core variances scale with frame row: -VARY_FRAC at the
            # region top to +VARY_FRAC at the bottom (clipped outside)
            t = np.clip((row - REGION_Y0) / REGION_H, 0.0, 1.0)
            scale = 1.0 + VARY_FRAC * (2.0 * t - 1.0)
            s1, s2, sp, beta, b, p0 = TRUE_PSF
            params = (s1 * scale, s2 * scale, sp, beta, b, p0)
            const = sdss_psf_unnorm(gy**2 + gx**2, params).sum()
            r2 = dy[:, None] ** 2 + dx[None, :] ** 2
            return sdss_psf_unnorm(r2, params) / const

    else:
        raise ValueError(f"unknown misspec mode {misspec!r}")
    return psf


def render_stars(rows, cols, fluxes_nmgy, nelec_per_nmgy, psf=None):
    """Patch-truncated PSF render into a full frame (electron units),
    mirroring models/imaging.py:92-118: pixel (h, w) receives flux iff
    |h - floor(ly)| <= r and |w - floor(lx)| <= r, distances to pixel
    centres at +0.5."""
    if psf is None:
        psf = psf_eval_factory("none")
    frame = np.zeros((FRAME_H, FRAME_W), dtype=np.float64)
    r = PSF_RADIUS
    off = np.arange(-r, r + 1)
    for row, col, f in zip(rows, cols, fluxes_nmgy):
        h0, w0 = int(np.floor(row)), int(np.floor(col))
        hh = h0 + off
        ww = w0 + off
        hv = (hh >= 0) & (hh < FRAME_H)
        wv = (ww >= 0) & (ww < FRAME_W)
        if not hv.any() or not wv.any():
            continue
        hh, ww = hh[hv], ww[wv]
        dy = (hh + 0.5) - row
        dx = (ww + 0.5) - col
        frame[np.ix_(hh, ww)] += (
            f * nelec_per_nmgy * psf(dy, dx, row, col)
        )
    return frame


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default=str(Path(__file__).parent / "data"))
    parser.add_argument("--seed", type=int, default=6838)  # NGC 6838
    parser.add_argument(
        "--psf-misspec",
        choices=("none", "elliptical", "varying"),
        default="none",
        help="render with a PSF outside the circular 6-parameter "
        "inference family (same seed => identical star field, so the "
        "comparison against the well-specified fixture isolates the "
        "PSF effect)",
    )
    parser.add_argument(
        "--no-giants",
        action="store_true",
        help="omit the 4 saturated giants (same seed => every other star "
        "identical), isolating the masked giants' wing photons from the "
        "m71 coverage residual (VERDICT r4 task 7)",
    )
    args = parser.parse_args()
    rng = np.random.default_rng(args.seed)
    psf_render = psf_eval_factory(args.psf_misspec)

    data_dir = Path(args.data_dir)
    d2 = data_dir / "sdss" / str(RUN) / str(CAMCOL)
    d3 = d2 / str(FIELD)
    d3.mkdir(parents=True, exist_ok=True)
    m71_dir = data_dir / "m71"
    m71_dir.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------------
    # 1. the stellar field: homogeneous Poisson over region + fit patch
    # ------------------------------------------------------------------
    def draw_field(y0, x0, h, w):
        n = rng.poisson(MU_PER_PX * h * w)
        rows = rng.uniform(y0, y0 + h, n)
        cols = rng.uniform(x0, x0 + w, n)
        fluxes = sample_truncated_pareto(rng, n)
        return rows, cols, fluxes

    reg = draw_field(REGION_Y0, REGION_X0, REGION_H, REGION_W)
    # a handful of genuine giants above the truncated-Pareto support
    # (real M71 has mag < 14 giants; they drive the reference's
    # saturation-with-neighbors tile masking, m71.ipynb cell 21). Two
    # clusters, like the real core concentration — scattering them would
    # let the 7x7 dilation wipe most of the grid.
    n_giants = 4
    centers = np.asarray([[REGION_Y0 + 70.0, REGION_X0 + 50.0],
                          [REGION_Y0 + 240.0, REGION_X0 + 105.0]])
    g_rows = np.repeat(centers[:, 0], 2) + rng.uniform(-9, 9, n_giants)
    g_cols = np.repeat(centers[:, 1], 2) + rng.uniform(-9, 9, n_giants)
    g_flux = np.exp(
        rng.uniform(np.log(2600.0), np.log(20000.0), n_giants)
    )  # mag ~ 11.7 .. 14.0
    # --no-giants ablation (VERDICT r4 task 7): the giant draws above are
    # still consumed so the rest of the rng stream — and therefore every
    # other star — is bit-identical to the default fixture; only the
    # giants' photons (and the saturation masking they trigger) differ.
    if not args.no_giants:
        reg = (
            np.concatenate([reg[0], g_rows]),
            np.concatenate([reg[1], g_cols]),
            np.concatenate([reg[2], g_flux]),
        )
    # pad ring around the region so tiles at the region boundary see
    # neighbour photons exactly like interior ones (pad = 4 px)
    ring = []
    for y0, x0, h, w in [
        (REGION_Y0 - 8, REGION_X0 - 8, 8, REGION_W + 16),
        (REGION_Y0 + REGION_H, REGION_X0 - 8, 8, REGION_W + 16),
        (REGION_Y0, REGION_X0 - 8, REGION_H, 8),
        (REGION_Y0, REGION_X0 + REGION_W, REGION_H, 8),
    ]:
        ring.append(draw_field(y0, x0, h, w))
    patch = draw_field(FIT_Y0, FIT_X0, FIT_HW, FIT_HW)
    # one bright (unsaturated) star near the fit-patch centre: the
    # power-law wing is only identifiable against a high-S/N profile
    # (the reference picks its fit region around a bright star,
    # psf_comparison.ipynb); peak ~ 500 * 856 * psf(0) ~ 38k < 60k counts
    bright = (
        np.asarray([FIT_Y0 + 30.4]),
        np.asarray([FIT_X0 + 33.7]),
        np.asarray([500.0]),
    )
    rows = np.concatenate(
        [reg[0]] + [r[0] for r in ring] + [patch[0], bright[0]]
    )
    cols = np.concatenate(
        [reg[1]] + [r[1] for r in ring] + [patch[1], bright[1]]
    )
    fluxes = np.concatenate(
        [reg[2]] + [r[2] for r in ring] + [patch[2], bright[2]]
    )
    print(f"{rows.size} stars ({reg[0].size} in the target region)")

    # ------------------------------------------------------------------
    # 2. frames: stars + spatially varying sky + Gaussian read noise
    # ------------------------------------------------------------------
    nelec_per_nmgy = float(GAINS[RBAND] / CALIB_NMGY_PER_COUNT)
    stars_e = render_stars(rows, cols, fluxes, nelec_per_nmgy, psf=psf_render)

    # ALLSKY grid in counts with a smooth ~8% gradient (the real field's
    # sky varies slowly across the frame)
    gy, gx = np.mgrid[0:6, 0:8]
    sky_small_r = (
        SKY_COUNTS * (1.0 + 0.05 * gy / 5.0 + 0.03 * np.sin(gx / 7.0 * np.pi))
    ).astype(np.float32)

    for b, band in enumerate(BANDS):
        gain = float(GAINS[b])
        sky_small = (
            sky_small_r if band == "r"
            else np.full((6, 8), SKY_COUNTS, dtype=np.float32)
        ) * (gain / GAINS[RBAND])
        # reader-side sky: nearest-grid interpolation (ingest/sdss.py:189-217)
        yint = np.linspace(0, 5, FRAME_H, dtype=np.float32)
        xint = np.linspace(0, 7, FRAME_W, dtype=np.float32)
        iy = np.clip(np.rint(yint).astype(int), 0, 5)
        ix = np.clip(np.rint(xint).astype(int), 0, 7)
        sky_e = sky_small[iy[:, None], ix[None, :]] * gain

        rate_e = sky_e + (stars_e if band == "r" else 0.0)
        noisy_e = rate_e + np.sqrt(NOISE_ADD + NOISE_MULT * rate_e) * (
            rng.standard_normal((FRAME_H, FRAME_W))
        )
        calib = np.full(
            FRAME_W, CALIB_NMGY_PER_COUNT * gain / GAINS[RBAND],
            dtype=np.float32,
        )
        frame_nmgy = ((noisy_e - sky_e) / (gain / calib[None, :])).astype(
            np.float32
        )
        fits.write_hdus(
            d3 / f"frame-{band}-{RUN:06d}-{CAMCOL}-{FIELD:04d}.fits",
            [
                fits.image_hdu_bytes(frame_nmgy, WCS_CARDS, primary=True),
                fits.image_hdu_bytes(calib),
                fits.bintable_hdu_bytes(
                    {
                        "ALLSKY": sky_small[None],
                        "XINTERP": xint[None],
                        "YINTERP": yint[None],
                    }
                ),
            ],
        )

    fits.write_hdus(
        d2 / f"photoField-{RUN:06d}-{CAMCOL}.fits",
        [
            fits.image_hdu_bytes(primary=True),
            fits.bintable_hdu_bytes(
                {
                    "FIELD": np.asarray([FIELD], dtype=np.int32),
                    "GAIN": GAINS[None],
                }
            ),
        ],
    )

    # psField: perturbed PSF estimate (sqrt convention on the sigma fields,
    # ingest/sdss.read_psf_params squares them on load)
    s1, s2, sp, beta, bb, p0 = TRUE_PSF
    est = {
        "psf_sigma1": np.sqrt(s1 * 1.10),
        "psf_sigma2": np.sqrt(s2 * 0.92),
        "psf_sigmap": np.sqrt(sp * 1.08),
        "psf_beta": beta,
        "psf_b": bb * 1.25,
        "psf_p0": p0 * 0.8,
    }
    psf_fields = {
        k: np.full((1, 5), v, dtype=np.float32) for k, v in est.items()
    }
    filler = fits.image_hdu_bytes()
    fits.write_hdus(
        d3 / f"psField-{RUN:06d}-{CAMCOL}-{FIELD:04d}.fits",
        [fits.image_hdu_bytes(primary=True)]
        + [filler] * 5
        + [fits.bintable_hdu_bytes(psf_fields)],
    )

    # ------------------------------------------------------------------
    # 3. Hubble-style .zpt truth catalog (all stars; small measurement
    #    scatter; cols 9/21/22 = mag/RA/DEC like the ACSGGCT product)
    # ------------------------------------------------------------------
    wcs = TanWCS.from_header(WCS_CARDS)
    # ACS astrometry is ~0.05" vs the 0.396" SDSS pixel: positional
    # scatter ~0.01 SDSS px; ACSGGCT photometry good to ~0.01 mag
    cat_rows = rows + rng.normal(0.0, 0.01, rows.size)
    cat_cols = cols + rng.normal(0.0, 0.01, cols.size)
    mags = 22.5 - 2.5 * np.log10(fluxes) + rng.normal(0.0, 0.01, rows.size)
    # rows/cols are model-locs (pixel centres at +0.5); pix2world expects
    # FITS pixel indices (centres at integers), and plocs_from_ra_dec adds
    # the +0.5 back on recovery (ingest/wcs.py plocs convention)
    ra, dec = wcs.pix2world(cat_cols - 0.5, cat_rows - 0.5)
    table = np.zeros((rows.size, 23))
    table[:, 9] = mags
    table[:, 21] = ra
    table[:, 22] = dec
    with open(m71_dir / "hubble_ngc6838.zpt", "w") as f:
        f.write(
            "# synthetic ACSGGCT-style catalog (offline fixture — see"
            " NETWORK.md)\n# generating model: manuscript.tex:564\n"
            f"# seed={args.seed}\n"
        )
        np.savetxt(f, table, fmt="%.8f")

    # exact generating star list (frame pixel coords, nmgy): lets
    # prepare_data.py emit a scatter-free truth variant (tiles_exact.npz)
    # that isolates the Hubble-catalog astrometric/photometric scatter +
    # WCS round-trip from the coverage residual. The real archive offers
    # no analogue — this is fixture-only instrumentation.
    np.savez_compressed(
        m71_dir / "truth_stars.npz", rows=rows, cols=cols, fluxes=fluxes
    )

    # ground-truth generator record (for fit-recovery checks)
    import yaml

    with open(m71_dir / "fixture_truth.yaml", "w") as f:
        yaml.safe_dump(
            {
                "mu_per_px": MU_PER_PX,
                "flux_alpha": FLUX_ALPHA,
                "flux_lower": FLUX_LOWER,
                "flux_upper": FLUX_UPPER,
                "psf_params": list(TRUE_PSF),
                "nelec_per_nmgy": nelec_per_nmgy,
                "noise_multiplicative": NOISE_MULT,
                "noise_additive": NOISE_ADD,
                "sky_counts": SKY_COUNTS,
                "seed": args.seed,
                "no_giants": bool(args.no_giants),
                "psf_misspec": args.psf_misspec,
                "psf_misspec_params": (
                    {"q": ELL_Q, "theta_deg": 30.0}
                    if args.psf_misspec == "elliptical"
                    else {"vary_frac": VARY_FRAC}
                    if args.psf_misspec == "varying"
                    else {}
                ),
            },
            f,
            sort_keys=False,
        )
    print(f"fixture written under {data_dir}")


if __name__ == "__main__":
    main()
