#!/usr/bin/env python
"""Divide-and-conquer vs single-tile posterior agreement.

The tree merge's correctness criterion: per-tile CS-SMC + binary-tree
aggregation over a 2x2 grid must reproduce the posterior of a single
CS-SMC run on the whole 16x16 image (the reference's divideandconquer
scenario, which it only visualizes). Run ``run_smc.py`` and
``run_smc_singletile.py`` over the same ``tiles.npz`` first.

Outputs ``singletile_comparison.json`` + ``figures/singletile_comparison.png``.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from common import experiment_config

SMC_COLOR = "#2a78d6"
NEUTRAL = "#6b6b66"


def weighted_pmf(counts, weights, K):
    pmf = np.zeros((counts.shape[0], K))
    for k in range(K):
        pmf[:, k] = ((counts == k) * weights).sum(-1)
    return pmf / np.maximum(pmf.sum(-1, keepdims=True), 1e-12)


def main():
    from smcdet_tpu.runner import load_results

    cfg = experiment_config(Path(__file__))
    out_dc = Path(cfg.output_dir) / "divideandconquer"
    out_st = Path(cfg.output_dir) / "divideandconquer_singletile"
    dc = load_results(out_dc, "smc")
    st = load_results(out_st, "smc")

    n = min(dc["pruned_counts"].shape[0], st["pruned_counts"].shape[0])
    K = int(max(dc["pruned_counts"].max(), st["pruned_counts"].max())) + 2
    dc_pmf = weighted_pmf(dc["pruned_counts"][:n], dc["weights"][:n], K)
    st_pmf = weighted_pmf(st["pruned_counts"][:n], st["weights"][:n], K)

    tvd = 0.5 * np.abs(dc_pmf - st_pmf).sum(-1)
    mean_dc = (dc_pmf * np.arange(K)).sum(-1)
    mean_st = (st_pmf * np.arange(K)).sum(-1)

    report = {
        "images": int(n),
        "count_pmf_tvd": {
            "mean": round(float(tvd.mean()), 4),
            "median": round(float(np.median(tvd)), 4),
            "p90": round(float(np.quantile(tvd, 0.9)), 4),
        },
        "mean_count": {
            "mean_abs_diff": round(
                float(np.abs(mean_dc - mean_st).mean()), 4
            ),
            "max_abs_diff": round(float(np.abs(mean_dc - mean_st).max()), 4),
        },
    }
    with open(out_dc / "singletile_comparison.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(9.2, 4.0))
    ax = axes[0]
    lim = max(mean_dc.max(), mean_st.max()) * 1.05 + 0.1
    ax.plot([0, lim], [0, lim], color=NEUTRAL, linewidth=1, linestyle="--")
    ax.scatter(mean_st, mean_dc, s=16, alpha=0.6, color=SMC_COLOR,
               linewidths=0)
    ax.set_xlabel("single-tile posterior mean count")
    ax.set_ylabel("divide-and-conquer posterior mean count")
    ax.set_title("Posterior mean detectable count", fontsize=11)
    ax.spines[["top", "right"]].set_visible(False)

    ax = axes[1]
    ax.hist(tvd, bins=np.linspace(0, max(0.3, tvd.max()), 25),
            color=SMC_COLOR, edgecolor="white", linewidth=0.8)
    ax.set_xlabel("TV distance between count pmfs")
    ax.set_ylabel("images")
    ax.set_title("D&C vs single-tile count pmf", fontsize=11)
    ax.spines[["top", "right"]].set_visible(False)
    fig.suptitle(
        f"Divide-and-conquer aggregation vs whole-image CS-SMC "
        f"({n} images)",
        fontsize=12,
    )
    fig.tight_layout()
    fig_dir = out_dc / "figures"
    fig_dir.mkdir(parents=True, exist_ok=True)
    fig.savefig(fig_dir / "singletile_comparison.png", dpi=150)
    print(f"figure: {fig_dir / 'singletile_comparison.png'}")


if __name__ == "__main__":
    main()
