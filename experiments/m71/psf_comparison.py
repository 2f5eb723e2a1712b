#!/usr/bin/env python
"""PSF model comparison: Gaussian vs survey psField vs fitted model vs an
empirical isolated star.

Script version of the reference's PSF-comparison notebook
(/root/reference/experiments/m71/psf_comparison.ipynb, cells 5-26):

1. the generic Gaussian PSF stamp (cells 5-7);
2. the survey-provided SDSS PSF rasterized from the psField 6-parameter
   profile (cells 8-11; the reference rasterizes via galsim, we evaluate
   the profile directly — ingest/psf.py);
3. the inference model's PSF (the LBFGS-refit 6-parameter profile from
   params.yaml; cells 12-14) and its difference from the survey PSF
   (cells 15-16);
4. an empirical isolated single-star M71 tile vs its noiseless model
   reconstruction and the residual (cells 18-26), with the residual
   normalised by the model's own noise scale.

Outputs ``psf_comparison.json`` + ``figures/psf_comparison.png`` under
output/m71/.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from common import experiment_config

RBAND = 2
STAMP = 25


def fwhm(stamp):
    """Full width at half max of a centred radial stamp, by interpolating
    the azimuthally-binned profile."""
    c = (stamp.shape[0] - 1) / 2
    yy, xx = np.mgrid[: stamp.shape[0], : stamp.shape[1]]
    r = np.hypot(yy - c, xx - c).ravel()
    v = stamp.ravel()
    order = np.argsort(r)
    r, v = r[order], v[order]
    half = v[0] / 2.0
    below = np.nonzero(v < half)[0]
    if below.size == 0:
        return float("nan")
    i = below[0]
    # linear interpolation between the straddling samples
    r0, r1, v0, v1 = r[i - 1], r[i], v[i - 1], v[i]
    return float(2.0 * (r0 + (v0 - half) / max(v0 - v1, 1e-12) * (r1 - r0)))


def main():
    import argparse
    import os

    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config",
        default="config.yaml",
        help="alternate config (e.g. config_mis.yaml for the "
        "misspecified-PSF fixture)",
    )
    args = parser.parse_args()

    # analysis-only script: stay off the (flaky) TPU tunnel unless asked
    if os.environ.get("SMCDET_M71_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from smcdet_tpu.ingest.psf import render_psf_image
    from smcdet_tpu.ingest.sdss import read_psf_params
    from smcdet_tpu.models.psf import GaussianPSF, SDSSPSF

    here = Path(__file__).resolve().parent
    cfg = experiment_config(Path(__file__), args.config)
    out_dir = here / cfg.output_dir / cfg.name
    out_dir.mkdir(parents=True, exist_ok=True)
    # data root ("data" or "data_mis") from the config's tiles path
    data_root = here / Path(cfg.data_path).parts[0]

    # --- 1. Gaussian PSF (the generic ImageModel default) ------------
    # The reference's fitted r-band seeing width (psf_comparison.ipynb
    # cell 6).
    gauss_stdev = 1.9273269405185427
    c = (STAMP - 1) / 2
    yy, xx = np.mgrid[:STAMP, :STAMP]
    r2 = ((yy - c) ** 2 + (xx - c) ** 2).astype(np.float32)
    gauss = np.asarray(GaussianPSF(stdev=jnp.float32(gauss_stdev)).normalized(r2))
    gauss = gauss / gauss.sum()

    # --- 2. survey psField PSF (rasterized 6-param profile) ----------
    psfield = (
        data_root / "sdss" / "6895" / "3" / "52"
        / "psField-006895-3-0052.fits"
    )
    survey_params = read_psf_params(str(psfield), bands=[RBAND])[0]
    survey = render_psf_image(survey_params, STAMP)

    # --- 3. the inference model's fitted PSF --------------------------
    fitted_params = np.asarray(cfg.image_model.psf_params, dtype=np.float64)
    fitted_psf = SDSSPSF.create(fitted_params, cfg.image_model.psf_radius)
    fitted = np.asarray(fitted_psf.unnormalized(jnp.asarray(r2)))
    fitted = fitted / fitted.sum()

    diff = survey - fitted
    psf_summary = {
        "gaussian_fwhm_px": round(fwhm(gauss), 3),
        "survey_psfield_fwhm_px": round(fwhm(survey), 3),
        "fitted_model_fwhm_px": round(fwhm(fitted), 3),
        "survey_params": [round(float(x), 6) for x in survey_params],
        "fitted_params": [round(float(x), 6) for x in fitted_params],
        "survey_vs_fitted": {
            "max_abs_diff_over_peak": round(
                float(np.abs(diff).max() / survey.max()), 4
            ),
            "l2_over_l2": round(
                float(np.linalg.norm(diff) / np.linalg.norm(survey)), 4
            ),
        },
    }

    # --- 4. empirical isolated star vs model reconstruction ----------
    # The tile-level truth catalogs only cover the 4-px padded window and
    # the fit region, so region-boundary tiles can hide rendered stars
    # 4-8 px outside the tile (within the radius-8 render patch but
    # outside both windows). Isolation is therefore checked against the
    # FULL Hubble catalog projected through the frame WCS — exactly one
    # star inside the tile, minimal total neighbor flux within the
    # render-reach window — and the reconstruction includes every catalog
    # neighbor, mirroring the patch-truncated render of
    # make_fixture.render_stars (pixel centres at +0.5, 17x17 boxes
    # around floor(loc)).
    import prepare_data as P

    from smcdet_tpu.ingest.sdss import SloanDigitalSkySurvey
    from smcdet_tpu.ingest.wcs import plocs_from_ra_dec
    from smcdet_tpu.utils.units import convert_mag_to_nmgy

    data_path = Path(cfg.data_path)
    if not data_path.is_absolute() and not data_path.exists():
        data_path = here / data_path
    tiles = np.load(data_path)
    counts = tiles["true_counts"]

    sdss = SloanDigitalSkySurvey(
        fields=[{"run": P.RUN, "camcol": P.CAMCOL, "fields": [P.FIELD]}],
        dir_path=str(data_root / "sdss"),
        load_image_data=True,
    )
    sdss.prepare_data(download=False)
    item = sdss[0]
    hubble = np.loadtxt(
        data_root / "m71" / "hubble_ngc6838.zpt",
        skiprows=3,
        usecols=(9, 21, 22),
    )
    flux_all = np.asarray(convert_mag_to_nmgy(hubble[:, 0]))
    locs_all = np.asarray(
        plocs_from_ra_dec(hubble[:, 1], hubble[:, 2], item["wcs"][RBAND])
    )
    tw = P.REGION_W // P.TILE
    RENDER_R = 8  # make_fixture.PSF_RADIUS

    def tile_neighbors(k):
        """All catalog stars that can deposit flux into kept tile k,
        in tile-local coords: (inside_star, neighbor_locs, neighbor_fluxes)."""
        torig = int(tiles["tile_index"][k])
        ty = (torig // tw) * P.TILE + P.REGION_Y0
        tx = (torig % tw) * P.TILE + P.REGION_X0
        rel = locs_all - [ty, tx]
        near = (
            (rel[:, 0] > -RENDER_R - 0.6)
            & (rel[:, 0] < P.TILE + RENDER_R + 0.6)
            & (rel[:, 1] > -RENDER_R - 0.6)
            & (rel[:, 1] < P.TILE + RENDER_R + 0.6)
        )
        r_near, f_near = rel[near], flux_all[near]
        inside = (
            (r_near[:, 0] >= 0)
            & (r_near[:, 0] < P.TILE)
            & (r_near[:, 1] >= 0)
            & (r_near[:, 1] < P.TILE)
        )
        return r_near, f_near, inside

    best, best_ratio = None, np.inf
    for k in np.flatnonzero(counts == 1):
        r_near, f_near, inside = tile_neighbors(int(k))
        if int(inside.sum()) != 1:
            continue
        tgt = float(f_near[inside][0])
        contam = float(f_near[~inside].sum())
        if tgt > 100 and contam / tgt < best_ratio:
            best, best_ratio = int(k), contam / tgt
    if best is None:
        raise RuntimeError(
            "no isolated star found: no single-count tile has exactly one "
            "in-tile catalog star above 100 nmgy — relax the flux floor "
            "or inspect the fixture's catalog density"
        )
    idx = best
    r_near, f_near, inside = tile_neighbors(idx)
    loc = r_near[inside][0]
    flux = float(f_near[inside][0])
    nb_locs, nb_fluxes = r_near[~inside], f_near[~inside]
    tile = tiles["images"][idx].astype(np.float64)
    bg = tiles["background"][idx].astype(np.float64)

    adu = float(cfg.image_model.adu_per_nmgy)
    h_px = np.arange(tile.shape[0])
    w_px = np.arange(tile.shape[1])

    def render_star(ly, lx, f):
        """One patch-truncated star into the tile (ADU), the
        make_fixture.render_stars convention."""
        in_h = np.abs(h_px - np.floor(ly)) <= RENDER_R
        in_w = np.abs(w_px - np.floor(lx)) <= RENDER_R
        rr2 = ((h_px + 0.5) - ly)[:, None] ** 2 + ((w_px + 0.5) - lx)[
            None, :
        ] ** 2
        pa = np.asarray(
            fitted_psf.normalized(jnp.asarray(rr2, dtype=jnp.float32))
        )
        return adu * f * pa * (in_h[:, None] & in_w[None, :])

    nb_image = sum(
        (render_star(ly, lx, f) for (ly, lx), f in zip(nb_locs, nb_fluxes)),
        np.zeros_like(tile),
    )

    def noise_sigma(model_img):
        return np.sqrt(
            float(cfg.image_model.noise_additive)
            + float(cfg.image_model.noise_multiplicative)
            * np.maximum(model_img, 1.0)
        )

    recon = render_star(loc[0], loc[1], flux) + nb_image + bg
    resid = tile - recon
    sigma = noise_sigma(recon)
    # The catalog loc/flux went through a WCS + magnitude round-trip
    # (make_fixture adds ~0.01-px / 0.01-mag catalog scatter), so the raw
    # residual mixes catalog quantisation with PSF shape error. Refitting
    # the target's (loc, flux) with the PSF FIXED isolates the PSF: a
    # well-specified PSF reaches residual/noise ~ 1, a misspecified one
    # cannot (the analogue of the reference's real-data finding,
    # manuscript.tex:686-688).
    from scipy.optimize import least_squares

    def refit_resid(theta):
        ly, lx, lf = theta
        model_img = render_star(ly, lx, np.exp(lf)) + nb_image + bg
        return ((tile - model_img) / noise_sigma(model_img)).ravel()

    fit = least_squares(
        refit_resid, x0=[float(loc[0]), float(loc[1]), np.log(flux)],
        method="lm",
    )
    refit_rms = float(np.sqrt(np.mean(fit.fun**2)))

    star_summary = {
        "tile_index": idx,
        "true_flux_nmgy": round(flux, 3),
        "neighbor_flux_sum_nmgy": round(float(nb_fluxes.sum()), 3),
        "num_neighbors_in_render_reach": int(nb_fluxes.size),
        "peak_adu": round(float(tile.max()), 1),
        "residual_rms_over_noise": round(float(np.sqrt(np.mean((resid / sigma) ** 2))), 3),
        "residual_max_abs_over_peak": round(
            float(np.abs(resid).max() / tile.max()), 4
        ),
        "refit_loc_offset_px": [
            round(float(fit.x[0] - loc[0]), 4),
            round(float(fit.x[1] - loc[1]), 4),
        ],
        "refit_flux_rel_change": round(float(np.exp(fit.x[2]) / flux - 1.0), 4),
        "refit_residual_rms_over_noise": round(refit_rms, 3),
    }

    report = {"psf": psf_summary, "empirical_star": star_summary}
    with open(out_dir / "psf_comparison.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 4, figsize=(15.2, 7.6))
    panels = [
        (gauss, f"Gaussian (FWHM {psf_summary['gaussian_fwhm_px']:.2f} px)"),
        (survey, "survey psField profile"),
        (fitted, "fitted model PSF"),
        (diff, "survey − fitted"),
    ]
    for ax, (img, title) in zip(axes[0], panels):
        im = ax.imshow(np.asarray(img, dtype=np.float64), cmap="gray")
        fig.colorbar(im, ax=ax, fraction=0.045)
        ax.set_title(title, fontsize=10)
        ax.set_xticks([])
        ax.set_yticks([])

    star_panels = [
        (tile, f"M71 tile {idx} (isolated star)"),
        (recon, "noiseless reconstruction"),
        (resid, "residual (ADU)"),
        (resid / sigma, "residual / noise σ"),
    ]
    for ax, (img, title) in zip(axes[1], star_panels):
        im = ax.imshow(np.asarray(img, dtype=np.float64), cmap="gray")
        fig.colorbar(im, ax=ax, fraction=0.045)
        ax.scatter([loc[1] - 0.5], [loc[0] - 0.5], marker="*", s=160,
                   c="#eb6834", edgecolors="black")
        ax.set_title(title, fontsize=10)
        ax.set_xticks([])
        ax.set_yticks([])
    fig.suptitle(
        "PSF comparison (psf_comparison.ipynb cells 5-26): model vs survey "
        "vs empirical star",
        fontsize=12,
    )
    fig.tight_layout()
    fig_dir = out_dir / "figures"
    fig_dir.mkdir(parents=True, exist_ok=True)
    fig.savefig(fig_dir / "psf_comparison.png", dpi=150)
    print(f"figure: {fig_dir / 'psf_comparison.png'}")


if __name__ == "__main__":
    main()
