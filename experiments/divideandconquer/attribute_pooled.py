#!/usr/bin/env python
"""Per-image attribution of the pooled D&C-vs-single-tile TVD gap.

Input: ``pooled_pmfs<suffix>.npz`` from ``compare_pooled.py --dump``
(per-rep per-image count pmfs of both pipelines + truth counts).
Output: ``pooled_attribution<suffix>.json`` — per-image pooled TVD vs
its own quadrature noise floor, ranked, with the pooled pmfs of the
worst images and summary statistics that test the candidate
explanations of the flat-in-bridge-effort mean gap
(docs/results/RESULTS.md, D&C bridge-effort ladder):

- ``corr_tvd_truth_count``: does the gap concentrate on crowded images?
- ``excess_by_truth_count``: mean (TVD - floor) per truth count.
- ``direction``: per hard image, whether D&C's pooled mean count is
  above or below the single-tile gold standard's.
"""

import argparse
import json
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--suffix", type=str, default="_dump")
    parser.add_argument("--top", type=int, default=6)
    args = parser.parse_args()

    out_dir = Path("output/divideandconquer")
    d = np.load(out_dir / f"pooled_pmfs{args.suffix}.npz")
    st, dc = d["st_pmfs"], d["dc_pmfs"]  # [R, I, K]
    truth = d["true_counts"]
    R, I, K = st.shape

    st_pool, dc_pool = st.mean(0), dc.mean(0)
    tvd = 0.5 * np.abs(st_pool - dc_pool).sum(-1)  # [I]

    def half_floor(pmfs):
        return 0.5 * np.abs(
            pmfs[: R // 2].mean(0) - pmfs[R // 2 :].mean(0)
        ).sum(-1)

    floor = 0.5 * np.sqrt(half_floor(st) ** 2 + half_floor(dc) ** 2)
    excess = tvd - floor
    order = np.argsort(-excess)

    ks = np.arange(K)
    st_mean = (st_pool * ks).sum(-1)
    dc_mean = (dc_pool * ks).sum(-1)

    def img_report(i):
        i = int(i)
        nz = st_pool[i] + dc_pool[i] > 1e-3
        return {
            "image": i,
            "truth_count": int(truth[i]),
            "pooled_tvd": round(float(tvd[i]), 3),
            "floor": round(float(floor[i]), 3),
            "singletile_mean_count": round(float(st_mean[i]), 2),
            "dc_mean_count": round(float(dc_mean[i]), 2),
            "singletile_pmf": {
                int(k): round(float(st_pool[i, k]), 3) for k in ks[nz]
            },
            "dc_pmf": {
                int(k): round(float(dc_pool[i, k]), 3) for k in ks[nz]
            },
            # per-rep spread: is either pipeline's pooled pmf still
            # rep-noise-dominated on this image?
            "singletile_rep_tvd_spread": round(
                float(0.5 * np.abs(st[:, i] - st_pool[i]).sum(-1).mean()), 3
            ),
            "dc_rep_tvd_spread": round(
                float(0.5 * np.abs(dc[:, i] - dc_pool[i]).sum(-1).mean()), 3
            ),
        }

    by_truth = {}
    for s in np.unique(truth):
        m = truth == s
        by_truth[int(s)] = {
            "n": int(m.sum()),
            "mean_excess": round(float(excess[m].mean()), 3),
            "mean_tvd": round(float(tvd[m].mean()), 3),
        }

    report = {
        "images": int(I),
        "reps": int(R),
        "tvd_mean": round(float(tvd.mean()), 4),
        "floor_mean": round(float(floor.mean()), 4),
        "excess_mean": round(float(excess.mean()), 4),
        "excess_top3_share": round(
            float(np.sort(excess)[-3:].sum() / max(excess.sum(), 1e-9)), 3
        ),
        "corr_tvd_truth_count": round(
            float(np.corrcoef(tvd, truth)[0, 1]), 3
        ),
        "mean_count_bias_dc_minus_single": round(
            float((dc_mean - st_mean).mean()), 4
        ),
        "excess_by_truth_count": by_truth,
        "hardest": [img_report(i) for i in order[: args.top]],
    }
    name = f"pooled_attribution{args.suffix}.json"
    with open(out_dir / name, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
