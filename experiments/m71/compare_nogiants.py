#!/usr/bin/env python
"""Measure the saturated-giants term of the m71 coverage residual.

VERDICT r4 task 7: the reach(0.94) -> m71(0.87) decomposition residual
was attributed to "masked saturated giants' wings, frame-level sky
structure, WCS cross-match scatter" with zero ablations. This script
turns the giants term into a measurement by comparing the default
fixture run against the --no-giants fixture run (same seed, identical
star field minus the 4 giants => identical pixels on every tile outside
the giants' render reach):

- geometry check: distance from every KEPT baseline tile to the nearest
  giant, vs the radius-8 render reach (the 7x7 saturation dilation
  *should* keep all wing photons out of kept tiles — verify, don't
  assume);
- coverage + count-confusion on the SHARED kept tiles (present in both
  runs), where any difference bounds the giants' total influence
  (photons + hyperparameter-fit shift + chunk-composition PRNG);
- each run's full-set coverage for the RESULTS.md table.

Usage (after both runs + analyses):
  python compare_nogiants.py \
      --base output/m71 --ablat output/m71_nogiants
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from make_fixture import (  # noqa: E402
    FLUX_UPPER,
    PSF_RADIUS,
    REGION_X0,
    REGION_Y0,
)

TILE = 8
TW = 160 // TILE  # region tile-grid width (prepare_data conventions)
LEVELS = [0.5, 0.8, 0.95]


def per_tile_arrays(run_dir: Path, method: str = "smc"):
    from smcdet_tpu.runner import load_results

    res = load_results(run_dir, method)
    tiles = np.load(run_dir / "tiles.npz")
    n = res["counts"].shape[0]
    return res, tiles, n


def coverage_on(idx, truth_total, est_total, weights):
    from smcdet_tpu.validation import credible_interval_coverage

    return [
        round(float(c), 4)
        for c in credible_interval_coverage(
            truth_total[idx],
            est_total[idx],
            LEVELS,
            weights=weights[idx] if weights is not None else None,
        )
    ]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base", default="output/m71")
    parser.add_argument("--ablat", default="output/m71_nogiants")
    parser.add_argument(
        "--truth-stars", default="data/m71/truth_stars.npz",
        help="baseline exact star list (for giant locations)",
    )
    parser.add_argument(
        "--out", default="output/nogiants_comparison.json"
    )
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    here = Path(__file__).parent
    base_res, base_tiles, nb = per_tile_arrays(here / args.base)
    abl_res, abl_tiles, na = per_tile_arrays(here / args.ablat)

    # --- geometry: kept-tile distance to the nearest giant -------------
    ts = np.load(here / args.truth_stars)
    g = ts["fluxes"] > FLUX_UPPER  # above the truncated-Pareto support
    g_rows = ts["rows"][g] - REGION_Y0
    g_cols = ts["cols"][g] - REGION_X0
    bi = base_tiles["tile_index"][:nb]
    ty = (bi // TW) * TILE
    tx = (bi % TW) * TILE
    # max-norm distance from the tile's pixel box to each giant: wing
    # photons reach a tile iff this is <= PSF_RADIUS (patch-truncated
    # render, models/imaging.py:92-103)
    dy = np.maximum(ty[:, None] - g_rows[None, :],
                    g_rows[None, :] - (ty[:, None] + TILE))
    dx = np.maximum(tx[:, None] - g_cols[None, :],
                    g_cols[None, :] - (tx[:, None] + TILE))
    cheb = np.maximum(np.maximum(dy, 0.0), np.maximum(dx, 0.0))
    d_min = cheb.min(1)
    in_reach = (cheb <= PSF_RADIUS).any(1)
    geometry = {
        "num_giants": int(g.sum()),
        "kept_tiles_within_render_reach": int(in_reach.sum()),
        "min_kept_tile_giant_distance_px": round(float(d_min.min()), 2),
    }

    # --- shared kept tiles ---------------------------------------------
    ai = abl_tiles["tile_index"][:na]
    shared = np.intersect1d(bi, ai)
    b_pos = {t: i for i, t in enumerate(bi)}
    a_pos = {t: i for i, t in enumerate(ai)}
    bsel = np.asarray([b_pos[t] for t in shared])
    asel = np.asarray([a_pos[t] for t in shared])

    def run_metrics(res, tiles, n, sel):
        truth_total = tiles["true_fluxes"][:n].sum(-1)
        est_total = res["pruned_fluxes"].sum(-1)
        weights = res.get("weights")
        nz = truth_total > 0
        keep_nz = sel[nz[sel]]
        return {
            "coverage_shared_nz": coverage_on(
                keep_nz, truth_total, est_total, weights
            ),
            "coverage_all_nz": coverage_on(
                np.flatnonzero(nz), truth_total, est_total, weights
            ),
            "images_all": int(n),
            "images_shared_nz": int(keep_nz.size),
        }

    report = {
        "levels": LEVELS,
        "geometry": geometry,
        "shared_tiles": int(shared.size),
        "base": run_metrics(base_res, base_tiles, nb, bsel),
        "nogiants": run_metrics(abl_res, abl_tiles, na, asel),
    }
    # identical images on shared tiles is the ablation's core premise —
    # verify bit-equality rather than assume it
    report["shared_images_identical"] = bool(
        np.array_equal(
            base_tiles["images"][:nb][bsel], abl_tiles["images"][:na][asel]
        )
    )
    out = here / args.out
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
