#!/usr/bin/env python
"""M71 data preparation: SDSS download, Hubble catalog, tiling, fitting.

Script version of the reference's data-prep notebook
(/root/reference/experiments/m71/m71.ipynb):

1. download SDSS run 6895 / camcol 3 / field 52 (photoField, frames,
   psField) and the ACS Globular Cluster Treasury Hubble catalog of
   NGC 6838 (cells 2-12);
2. crop the 320x160-pixel target region, split into 8x8 tiles with a
   checkerboard train/eval assignment, mask saturated tiles
   (cells 18-25);
3. project Hubble RA/DEC into pixel coordinates through the frame WCS
   (cell 13), fit the truncated-Pareto flux prior by MLE (cell 31), the
   Poisson count rate (cell 51), and the PSF/noise/calibration by LBFGS
   against the real image (cells 86-94);
4. write ``data/m71/tiles.npz`` + ``data/m71/params.yaml`` (cells 98-99).

Requires network access for step 1; pre-place the files under
``data/sdss`` / ``data/m71`` to run offline.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

RUN, CAMCOL, FIELD = 6895, 3, 52
RBAND = 2
# Target region in frame pixel coords (m71.ipynb cell 8: 320x160 region
# with corner at (x=1728, y=900)).
REGION_Y0, REGION_X0, REGION_H, REGION_W = 900, 1728, 320, 160
TILE = 8
HUBBLE_URL = (
    "https://archive.stsci.edu/pub/hlsp/acsggct/ngc6838/"
    "hlsp_acsggct_hst_acs-wfc_ngc6838_r.rdviq.cal.adj.zpt"
)
SATURATION_ADU = 60000.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--no-download", action="store_true")
    args = parser.parse_args()

    import jax.numpy as jnp

    from smcdet_tpu.fitting import (
        fit_image_model,
        fit_poisson_rate,
        fit_truncated_pareto_flux,
    )
    from smcdet_tpu.ingest.download import download_file_to_dst
    from smcdet_tpu.ingest.sdss import SloanDigitalSkySurvey
    from smcdet_tpu.ingest.wcs import plocs_from_ra_dec
    from smcdet_tpu.utils.units import convert_mag_to_nmgy

    data_dir = Path(args.data_dir)
    sdss_dir = data_dir / "sdss"
    m71_dir = data_dir / "m71"
    m71_dir.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------------
    # 1. SDSS + Hubble retrieval
    # ------------------------------------------------------------------
    survey = SloanDigitalSkySurvey(
        fields=[{"run": RUN, "camcol": CAMCOL, "fields": [FIELD]}],
        dir_path=str(sdss_dir),
        load_image_data=True,
    )
    survey.prepare_data(download=not args.no_download)
    item = survey[0]

    hubble_path = m71_dir / "hubble_ngc6838.zpt"
    if not hubble_path.exists():
        if args.no_download:
            raise FileNotFoundError(
                f"{hubble_path} missing; download {HUBBLE_URL} manually"
            )
        download_file_to_dst(HUBBLE_URL, hubble_path)
    # columns: 9 = V mag (zero-point adjusted), 21/22 = RA/DEC
    hubble = np.loadtxt(hubble_path, skiprows=3, usecols=(9, 21, 22))
    fluxes_all = np.asarray(convert_mag_to_nmgy(hubble[:, 0]))
    wcs = item["wcs"][RBAND]
    locs_all = plocs_from_ra_dec(hubble[:, 1], hubble[:, 2], wcs)

    # ------------------------------------------------------------------
    # 2. target region, tiles, checkerboard split, saturation mask
    # ------------------------------------------------------------------
    image = item["image"][RBAND]
    background = item["background"][RBAND]
    region = image[
        REGION_Y0 : REGION_Y0 + REGION_H, REGION_X0 : REGION_X0 + REGION_W
    ]
    region_bkg = background[
        REGION_Y0 : REGION_Y0 + REGION_H, REGION_X0 : REGION_X0 + REGION_W
    ]
    th, tw = REGION_H // TILE, REGION_W // TILE
    tiles = region.reshape(th, TILE, tw, TILE).transpose(0, 2, 1, 3)
    tiles_flat = tiles.reshape(-1, TILE, TILE)

    grid_h, grid_w = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
    checker = ((grid_h + grid_w) % 2 == 0).reshape(-1)
    saturated = tiles_flat.max((-2, -1)) > SATURATION_ADU
    keep = ~saturated

    in_region = (
        (locs_all[:, 0] >= REGION_Y0)
        & (locs_all[:, 0] < REGION_Y0 + REGION_H)
        & (locs_all[:, 1] >= REGION_X0)
        & (locs_all[:, 1] < REGION_X0 + REGION_W)
    )
    locs_region = locs_all[in_region] - [REGION_Y0, REGION_X0]
    fluxes_region = fluxes_all[in_region]

    # per-tile truth catalogs
    max_per_tile = 32
    true_counts = np.zeros(th * tw, dtype=np.int64)
    true_locs = np.zeros((th * tw, max_per_tile, 2))
    true_fluxes = np.zeros((th * tw, max_per_tile))
    for i, (r, c) in enumerate(zip(locs_region[:, 0], locs_region[:, 1])):
        t = int(r // TILE) * tw + int(c // TILE)
        m = true_counts[t]
        if m < max_per_tile:
            true_locs[t, m] = (r % TILE, c % TILE)
            true_fluxes[t, m] = fluxes_region[i]
            true_counts[t] += 1

    # ------------------------------------------------------------------
    # 3. hyperparameter fitting
    # ------------------------------------------------------------------
    pad = 4.0
    alpha, f_lower, f_upper = fit_truncated_pareto_flux(fluxes_region)
    counts_rate = fit_poisson_rate(
        true_counts[keep], area=(TILE + 2 * pad) ** 2
    )

    gain = float(np.mean(item["gain"][RBAND]))
    adu_per_nmgy0 = float(np.mean(item["flux_calibration"][RBAND]))
    psf_params0 = tuple(float(p) for p in item["psf_params"][RBAND])

    # fit on an off-target 64x64 patch with known Hubble stars
    fit_y0, fit_x0 = REGION_Y0 - 96, REGION_X0
    patch = image[fit_y0 : fit_y0 + 64, fit_x0 : fit_x0 + 64]
    patch_bkg = float(
        np.mean(background[fit_y0 : fit_y0 + 64, fit_x0 : fit_x0 + 64])
    )
    in_patch = (
        (locs_all[:, 0] >= fit_y0)
        & (locs_all[:, 0] < fit_y0 + 64)
        & (locs_all[:, 1] >= fit_x0)
        & (locs_all[:, 1] < fit_x0 + 64)
    )
    fit = fit_image_model(
        jnp.asarray(patch, dtype=jnp.float32),
        jnp.asarray(locs_all[in_patch] - [fit_y0, fit_x0], dtype=jnp.float32),
        jnp.asarray(fluxes_all[in_patch], dtype=jnp.float32),
        psf_params_init=psf_params0,
        background_init=patch_bkg,
        adu_per_nmgy_init=adu_per_nmgy0,
        num_steps=200,
    )

    # ------------------------------------------------------------------
    # 4. artifacts
    # ------------------------------------------------------------------
    np.savez_compressed(
        m71_dir / "tiles.npz",
        images=tiles_flat[keep],
        background=region_bkg.reshape(th, TILE, tw, TILE)
        .transpose(0, 2, 1, 3)
        .reshape(-1, TILE, TILE)[keep],
        checkerboard=checker[keep],
        true_counts=true_counts[keep],
        true_locs=true_locs[keep],
        true_fluxes=true_fluxes[keep],
        tile_index=np.flatnonzero(keep),
    )
    params = {
        "flux_alpha": alpha,
        "flux_lower": f_lower,
        "flux_upper": f_upper,
        "counts_rate": counts_rate,
        "pad": pad,
        "psf_radius": 8,
        "background": float(np.mean(region_bkg)),
        "gain": gain,
        "adu_per_nmgy": fit.adu_per_nmgy,
        "psf_params": list(fit.psf_params),
        "noise_additive": fit.noise_additive,
        "noise_multiplicative": fit.noise_multiplicative,
    }
    import yaml

    with open(m71_dir / "params.yaml", "w") as f:
        yaml.safe_dump(params, f, sort_keys=False)
    print("fitted params:", params)
    print(f"wrote {m71_dir / 'tiles.npz'} and {m71_dir / 'params.yaml'}")


if __name__ == "__main__":
    main()
