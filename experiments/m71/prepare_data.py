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
import os
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
PAD, REACH = 4.0, 9.0  # padded-window / render-reach half-widths (px)
# Hubble-catalog depth cut (m71.ipynb cell 15: mag < 24), which also sets
# the flux-prior support floor via the truncated-Pareto fit.
MAG_UPPER_BOUND = 24.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--no-download", action="store_true")
    args = parser.parse_args()

    import jax

    # The PSF/noise fit is a tiny 64x64-image optimisation: per-step
    # tunnel latency to the TPU dwarfs the compute, so force CPU (the
    # axon plugin overrides the JAX_PLATFORMS env var; the config update
    # wins — same shim as tests/conftest.py).
    if os.environ.get("SMCDET_PREPARE_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
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
    # depth cut (m71.ipynb cell 15)
    hubble = hubble[hubble[:, 0] < MAG_UPPER_BOUND]
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
    saturated_px = tiles_flat.max((-2, -1)) > SATURATION_ADU

    def tile_truth_catalogs(cat_locs_all, cat_fluxes_all):
        """Per-tile truth/padded/reach catalogs from a full-frame star
        list (frame pixel coords + nmgy fluxes). Factored so the same
        tiling runs on both the Hubble-catalog cross-match truth and —
        when the fixture ships its exact generating star list
        (truth_stars.npz) — the scatter-free truth, isolating the WCS
        cross-match term of the coverage residual (VERDICT r4 task 7)."""
        in_region = (
            (cat_locs_all[:, 0] >= REGION_Y0)
            & (cat_locs_all[:, 0] < REGION_Y0 + REGION_H)
            & (cat_locs_all[:, 1] >= REGION_X0)
            & (cat_locs_all[:, 1] < REGION_X0 + REGION_W)
        )
        locs_region = cat_locs_all[in_region] - [REGION_Y0, REGION_X0]
        fluxes_region = cat_fluxes_all[in_region]

        # per-tile truth catalogs (in-tile coords)
        max_per_tile = 32
        true_counts = np.zeros(th * tw, dtype=np.int64)
        true_locs = np.zeros((th * tw, max_per_tile, 2))
        true_fluxes = np.zeros((th * tw, max_per_tile))
        for i, (r, c) in enumerate(
            zip(locs_region[:, 0], locs_region[:, 1])
        ):
            t = int(r // TILE) * tw + int(c // TILE)
            m = true_counts[t]
            if m < max_per_tile:
                true_locs[t, m] = (r % TILE, c % TILE)
                true_fluxes[t, m] = fluxes_region[i]
                true_counts[t] += 1

        # per-tile padded-region catalogs: every star within the tile's
        # padded window [-pad, TILE+pad)^2 in padded-local coords — the
        # "unpruned" per-tile catalogs the reference's semisynthetic
        # experiment renders (m71.ipynb cells 19-23 ->
        # m71semisynthetic/generate_images.py:26-27).
        pad = PAD
        max_padded = 64
        padded_counts = np.zeros(th * tw, dtype=np.int64)
        padded_locs = np.zeros((th * tw, max_padded, 2))
        padded_fluxes = np.zeros((th * tw, max_padded))
        # render-reach catalogs: every catalog star whose radius-8 render
        # patch can deposit photons into the tile (window [-9, 17) around
        # the tile, a strict superset of the padded window). Stars 4-8 px
        # outside a tile are OUTSIDE the padded window but still light it
        # up — the m71 pixels carry their photons while the padded-catalog
        # semisynthetic render does not, which is one candidate cause of
        # the real-pixels coverage gap (the m71ss_reach ablation measures
        # it). Uses the full-frame catalog, not locs_region: for
        # region-boundary tiles the neighbors can sit outside the region.
        reach = REACH
        max_reach = 96
        locs_frame = cat_locs_all - [REGION_Y0, REGION_X0]
        reach_counts = np.zeros(th * tw, dtype=np.int64)
        reach_locs = np.zeros((th * tw, max_reach, 2))
        reach_fluxes = np.zeros((th * tw, max_reach))
        for t in range(th * tw):
            ty, tx = (t // tw) * TILE, (t % tw) * TILE
            rel = locs_region - [ty, tx]
            in_pad = (
                (rel[:, 0] >= -pad)
                & (rel[:, 0] < TILE + pad)
                & (rel[:, 1] >= -pad)
                & (rel[:, 1] < TILE + pad)
            )
            sel = np.flatnonzero(in_pad)[:max_padded]
            padded_counts[t] = sel.size
            padded_locs[t, : sel.size] = rel[sel]
            padded_fluxes[t, : sel.size] = fluxes_region[sel]

            rel_f = locs_frame - [ty, tx]
            in_reach = (
                (rel_f[:, 0] >= -reach)
                & (rel_f[:, 0] < TILE + reach)
                & (rel_f[:, 1] >= -reach)
                & (rel_f[:, 1] < TILE + reach)
            )
            sel_r = np.flatnonzero(in_reach)
            if sel_r.size > max_reach:
                raise RuntimeError(
                    f"tile {t}: {sel_r.size} stars in render reach "
                    f"exceeds the {max_reach}-slot reach catalog — "
                    "raise max_reach"
                )
            reach_counts[t] = sel_r.size
            reach_locs[t, : sel_r.size] = rel_f[sel_r]
            reach_fluxes[t, : sel_r.size] = cat_fluxes_all[sel_r]

        return {
            "true_counts": true_counts,
            "true_locs": true_locs,
            "true_fluxes": true_fluxes,
            "padded_counts": padded_counts,
            "padded_locs": padded_locs,
            "padded_fluxes": padded_fluxes,
            "reach_counts": reach_counts,
            "reach_locs": reach_locs,
            "reach_fluxes": reach_fluxes,
        }, locs_region, fluxes_region

    cat, locs_region, fluxes_region = tile_truth_catalogs(
        locs_all, fluxes_all
    )
    true_counts = cat["true_counts"]
    true_locs = cat["true_locs"]
    true_fluxes = cat["true_fluxes"]
    padded_counts = cat["padded_counts"]
    padded_locs = cat["padded_locs"]
    padded_fluxes = cat["padded_fluxes"]
    reach_counts = cat["reach_counts"]
    reach_locs = cat["reach_locs"]
    reach_fluxes = cat["reach_fluxes"]

    # Saturation masking (m71.ipynb cells 21-23): a tile is saturated iff
    # its truth catalog holds a star brighter than mag 14 (the SDSS
    # saturation limit — the reference's rule is catalog-based, not
    # pixel-based); the mask is then dilated with a 7x7 tile-grid kernel
    # so every tile within 3 tiles of a bright star is dropped —
    # bright-star spill contaminates neighbours far beyond the source
    # tile.
    bright_flux = 10 ** ((22.5 - 14.0) / 2.5)
    has_bright = np.zeros(th * tw, dtype=bool)
    for i, (r, c) in enumerate(zip(locs_region[:, 0], locs_region[:, 1])):
        if fluxes_region[i] > bright_flux:
            has_bright[int(r // TILE) * tw + int(c // TILE)] = True
    sat_grid = has_bright.reshape(th, tw)
    from scipy.ndimage import binary_dilation

    dil = binary_dilation(sat_grid, np.ones((7, 7), dtype=bool))
    keep = ~dil.reshape(-1)
    print(
        f"saturation: {int(sat_grid.sum())} tiles (mag<14), "
        f"{int(saturated_px.sum())} pixel-saturated -> "
        f"{int(dil.sum())} with neighbors; {int(keep.sum())} of {th * tw} kept"
    )

    # The catalog-based saturation mask only sees in-region stars; a
    # mag<14 giant just OUTSIDE the region boundary would render into a
    # kept boundary tile's reach catalog unmasked. Absent here; be loud
    # if a different field ever violates it.
    kept_reach_max = np.where(
        keep, reach_fluxes.max(-1), 0.0
    ).max()
    if kept_reach_max > bright_flux:
        import warnings

        warnings.warn(
            f"a kept tile's render-reach catalog holds a {kept_reach_max:.0f}"
            f"-nmgy star (> the mag-14 saturation limit {bright_flux:.0f}) — "
            "an out-of-region giant the catalog-based mask cannot see; "
            "the m71ss_reach ablation render will include its wings"
        )

    # ------------------------------------------------------------------
    # 3. hyperparameter fitting
    # ------------------------------------------------------------------
    # Hyperparameters are fitted on the train/tune checkerboard half only
    # (m71.ipynb cells 29, 49-51 restrict to ~checkerboard_mask), keeping
    # the eval half untouched by any fitting.
    tune = keep & checker
    tune_star = np.zeros(locs_region.shape[0], dtype=bool)
    for i, (r, c) in enumerate(zip(locs_region[:, 0], locs_region[:, 1])):
        tune_star[i] = tune[int(r // TILE) * tw + int(c // TILE)]
    # giants above SDSS saturation are masked out, not modeled: exclude
    # them from the flux-prior fit and pin the truncation point at the
    # saturation limit (the modeled population is sub-saturation stars;
    # the tune-half sample maximum would under-shoot the support by
    # orders of magnitude under the alpha ~ 0.2 tail)
    fit_fluxes = fluxes_region[tune_star & (fluxes_region < bright_flux)]
    alpha, f_lower, f_upper = fit_truncated_pareto_flux(
        fit_fluxes, upper=bright_flux
    )
    # Per-PIXEL density from in-tile counts over the in-tile area
    # (m71.ipynb cell 51 divides by tile_dim^2); the prior then scales by
    # the padded area (models/priors.py:306). Dividing by the padded area
    # here would double-count the pad and underestimate the density 4x.
    counts_rate = fit_poisson_rate(true_counts[tune], area=TILE**2)

    gain = float(np.mean(item["gain"][RBAND]))
    adu_per_nmgy0 = float(np.mean(item["flux_calibration"][RBAND]))
    psf_params0 = tuple(float(p) for p in item["psf_params"][RBAND])

    # fit on an off-target 64x64 patch with known Hubble stars. Include
    # stars up to psf_radius OUTSIDE the patch: their photons spill in,
    # and omitting them is model error the noise fit would absorb. Use
    # the real (spatially varying) background map, not its mean — the
    # reference assumes the SDSS-reported background correct (m71.ipynb
    # cell 83).
    fit_y0, fit_x0 = REGION_Y0 - 96, REGION_X0
    margin = 8.0  # psf_radius
    patch = image[fit_y0 : fit_y0 + 64, fit_x0 : fit_x0 + 64]
    patch_bkg = background[fit_y0 : fit_y0 + 64, fit_x0 : fit_x0 + 64]
    in_patch = (
        (locs_all[:, 0] >= fit_y0 - margin)
        & (locs_all[:, 0] < fit_y0 + 64 + margin)
        & (locs_all[:, 1] >= fit_x0 - margin)
        & (locs_all[:, 1] < fit_x0 + 64 + margin)
    )
    fit = fit_image_model(
        jnp.asarray(patch, dtype=jnp.float32),
        jnp.asarray(locs_all[in_patch] - [fit_y0, fit_x0], dtype=jnp.float32),
        jnp.asarray(fluxes_all[in_patch], dtype=jnp.float32),
        psf_params_init=psf_params0,
        background_init=jnp.asarray(patch_bkg, dtype=jnp.float32),
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
        padded_counts=padded_counts[keep],
        padded_locs=padded_locs[keep],
        padded_fluxes=padded_fluxes[keep],
        reach_counts=reach_counts[keep],
        reach_locs=reach_locs[keep],
        reach_fluxes=reach_fluxes[keep],
        tile_index=np.flatnonzero(keep),
    )

    # Scatter-free truth variant: when the offline fixture ships its
    # exact generating star list (make_fixture.py writes
    # truth_stars.npz; the real archive has no such thing), emit a
    # second tiles artifact whose truth catalogs bypass the Hubble-zpt
    # parse + WCS round-trip + astrometric/photometric scatter. Same
    # images, keep mask, and split — analyzing the SAME smc results
    # against it (analyze.py --tiles) measures the WCS cross-match term
    # of the coverage residual with no extra inference run.
    truth_path = m71_dir / "truth_stars.npz"
    if truth_path.exists():
        ts = np.load(truth_path)
        exact_locs = np.stack([ts["rows"], ts["cols"]], axis=-1)
        exact, _, _ = tile_truth_catalogs(
            exact_locs, np.asarray(ts["fluxes"])
        )
        np.savez_compressed(
            m71_dir / "tiles_exact.npz",
            images=tiles_flat[keep],
            background=region_bkg.reshape(th, TILE, tw, TILE)
            .transpose(0, 2, 1, 3)
            .reshape(-1, TILE, TILE)[keep],
            checkerboard=checker[keep],
            tile_index=np.flatnonzero(keep),
            **{k: v[keep] for k, v in exact.items()},
        )
        print(f"wrote {m71_dir / 'tiles_exact.npz'} (scatter-free truth)")
    params = {
        "flux_alpha": alpha,
        "flux_lower": f_lower,
        "flux_upper": f_upper,
        "counts_rate": counts_rate,
        "pad": PAD,
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
