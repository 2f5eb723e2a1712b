#!/usr/bin/env python
"""PSF-misspecification study: control vs elliptical vs varying renders.

The reference's real-M71 finding is that CS-SMC (and SEP) detect
spurious stars in the intermediate magnitude bins and that the inferred
total fluxes are poorly calibrated, attributed to PSF misspecification —
"the six-parameter SDSS PSF is not flexible enough. Alternatively,
perhaps the PSF parameters vary across M71, and thus the maximum
likelihood estimates ... are inaccurate for some cutouts"
(/root/reference/manuscript/manuscript.tex:686-688; results.ipynb cells
35-36, figures m71_countsmagbin / appdx totalflux). The real bytes are
unreachable offline (NETWORK.md), so both theorized mechanisms are
reproduced on fixtures with an IDENTICAL star field (same seed):

- control:    well-specified render (data/, output/m71)
- elliptical: anisotropic metric q=1.15 at 30 deg — outside the circular
              family (data_mis/, output/m71_mis)
- varying:    core variances drift -15%..+15% (width ~ +-7.2%) across
              the region; the fit patch sits at the -15% end, so the MLE
              PSF is wrong for most cutouts, noise fit stays honest
              (data_vary/, output/m71_vary)

Reports, per variant: total-flux credible-interval coverage (nominal
0.5/0.8/0.95), mean posterior-count excess over truth (spurious-star
mass), and — for the varying variant — coverage binned by region row
(distance from the fit patch). Outputs ``misspec_study.json`` +
``figures/misspec_study.png`` under output/m71/.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

VARIANTS = {
    "control": ("data", "output/m71"),
    "elliptical": ("data_mis", "output/m71_mis"),
    "varying": ("data_vary", "output/m71_vary"),
}
COLORS = {"control": "#2a78d6", "elliptical": "#b58a2a",
          "varying": "#eb6834"}
LEVELS = (0.5, 0.8, 0.95)
REGION_TILE_ROWS = 40  # 320-px region / 8-px tiles
TILE_COLS = 20  # 160-px region width / 8


def weighted_coverage(true_vals, samples, weights, level):
    from smcdet_tpu.validation import credible_interval_coverage

    return float(
        credible_interval_coverage(
            true_vals, samples, [level], weights=weights
        )[0]
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--level", type=float, default=0.95)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # pure numpy analysis

    from smcdet_tpu.runner import load_results

    here = Path(__file__).resolve().parent
    report = {"variants": {}}
    row_cov = {}
    for name, (data_dir, out_rel) in VARIANTS.items():
        out_dir = here / out_rel
        tiles_path = here / data_dir / "m71" / "tiles.npz"
        if not out_dir.exists() or not tiles_path.exists():
            report["variants"][name] = "missing (run the queue first)"
            continue
        tiles = np.load(tiles_path)
        try:
            res = load_results(out_dir, "smc")
        except FileNotFoundError:
            report["variants"][name] = "missing (run the queue first)"
            continue
        n = res["pruned_counts"].shape[0]
        truth_flux = tiles["true_fluxes"][:n].sum(-1)
        truth_count = tiles["true_counts"][:n]
        flux_samp = res["pruned_fluxes"][:n].sum(-1)  # [I, S]
        cnt_samp = res["pruned_counts"][:n].astype(np.float64)
        w = res["weights"][:n]

        pos = truth_flux > 0  # results.ipynb cell 39 masks truth>0
        cov = {
            str(lv): round(
                weighted_coverage(
                    truth_flux[pos], flux_samp[pos], w[pos], lv
                ),
                4,
            )
            for lv in LEVELS
        }
        mean_count = (cnt_samp * w).sum(-1) / w.sum(-1)
        excess = mean_count - truth_count
        variant = {
            "images": int(n),
            "total_flux_coverage": cov,
            "posterior_count_excess_mean": round(float(excess.mean()), 4),
            "posterior_count_excess_on_truth0": round(
                float(excess[truth_count == 0].mean()), 4
            )
            if (truth_count == 0).any()
            else None,
        }
        # coverage by region row (distance from the off-region fit patch
        # at the row-0 end) — the smoking gun for the varying variant
        from smcdet_tpu.validation import credible_interval_contains

        rows = (tiles["tile_index"][:n] // TILE_COLS).astype(int)
        inside = credible_interval_contains(
            truth_flux[pos], flux_samp[pos], args.level, weights=w[pos]
        )
        rpos = rows[pos]
        edges = np.linspace(0, REGION_TILE_ROWS, 5).astype(int)
        by_row = []
        for a, b in zip(edges[:-1], edges[1:]):
            m = (rpos >= a) & (rpos < b)
            by_row.append(
                {
                    "rows": [int(a), int(b)],
                    "n": int(m.sum()),
                    "coverage": round(float(inside[m].mean()), 4)
                    if m.any()
                    else None,
                }
            )
        variant[f"coverage_{args.level}_by_region_row"] = by_row
        row_cov[name] = by_row
        report["variants"][name] = variant

    out_dir = here / "output" / "m71"
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "misspec_study.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    if len(row_cov) < 2:
        return  # not enough variants for the figure yet

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11.2, 4.2))
    ax = axes[0]
    done = [k for k in VARIANTS if isinstance(report["variants"][k], dict)]
    width = 0.8 / len(done)
    for i, name in enumerate(done):
        cov = report["variants"][name]["total_flux_coverage"]
        xs = np.arange(len(LEVELS)) + (i - (len(done) - 1) / 2) * width
        ax.bar(xs, [cov[str(lv)] for lv in LEVELS], width,
               color=COLORS[name], label=name,
               edgecolor="white", linewidth=0.5)
    ax.plot(np.arange(len(LEVELS)), LEVELS, marker="_", markersize=26,
            linestyle="none", color="black", label="nominal")
    ax.set_xticks(np.arange(len(LEVELS)), [str(lv) for lv in LEVELS])
    ax.set_xlabel("nominal level")
    ax.set_ylabel("empirical total-flux coverage")
    ax.legend(frameon=False, fontsize=9)
    ax.spines[["top", "right"]].set_visible(False)

    ax = axes[1]
    for name, by_row in row_cov.items():
        xs = [0.5 * (b["rows"][0] + b["rows"][1]) for b in by_row]
        ys = [b["coverage"] for b in by_row]
        ax.plot(xs, ys, marker="o", color=COLORS[name], label=name)
    ax.axhline(args.level, color="black", linestyle="dotted", linewidth=1)
    ax.set_xlabel("region tile row (fit patch at row < 0)")
    ax.set_ylabel(f"coverage at nominal {args.level}")
    ax.legend(frameon=False, fontsize=9)
    ax.spines[["top", "right"]].set_visible(False)
    fig.suptitle(
        "PSF-misspecification study (manuscript.tex:686-688 mechanism, "
        "offline)",
        fontsize=12,
    )
    fig.tight_layout()
    fig_dir = out_dir / "figures"
    fig_dir.mkdir(parents=True, exist_ok=True)
    fig.savefig(fig_dir / "misspec_study.png", dpi=150)
    print(f"figure: {fig_dir / 'misspec_study.png'}")


if __name__ == "__main__":
    main()
