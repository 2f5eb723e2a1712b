#!/usr/bin/env python
"""Budget-dependence probe for the crowded-tile flux underestimate.

The second-draw m71 arm (seed 6839, queue r5c) found a real SBC rank
non-uniformity against the EXACT generating truth: the posterior
underestimates total flux, concentrated on 3-4-true-star tiles (mean
SBC rank 0.64 there vs the uniform 0.50; seed 6838 shows the same
direction at 0.51). This probe asks whether that residual is an
inference-resolution effect (insufficient particles / sweeps at the
m71 config's N=2048, 100 sweeps) or a model/fixture property:

  --make-subsets   write data_seed2/m71/tiles_crowded{,_exact}.npz —
                   the 156 tiles whose EXACT truth count is 3-4, all
                   keys preserved (the SMC runner consumes the same
                   schema as the full tiling);
  --compare        score every finished arm (base seed2 run restricted
                   to the same tiles via tile_index, the 4x-particles
                   arm, the 2x-sweeps arm) against the exact truth:
                   mean SBC rank, KS p, coverage95 — and write
                   docs/results/m71/crowded_budget_probe.json.

If mean rank drops toward 0.5 with budget, the residual is SMC
under-resolution on crowded tiles; if it is flat, the underestimate is
a property of the model/fixture pair (threshold-truncated truth, patch
render) and no sampler budget will remove it. Reference context: the
reference runs the same sampler family at N=2048 per count stratum on
these tiles (reference experiments/m71/run_smc.py:33-52) and never
measures this, because it has no exact generating truth to score
against — the fixture does.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parents[1]))

DATA = HERE / "data_seed2" / "m71"
RESULTS = HERE.parents[1] / "docs" / "results" / "m71"


def make_subsets():
    exact = np.load(DATA / "tiles_exact.npz")
    keep = (exact["true_counts"] >= 3) & (exact["true_counts"] <= 4)
    for src, dst in [
        ("tiles.npz", "tiles_crowded.npz"),
        ("tiles_exact.npz", "tiles_crowded_exact.npz"),
    ]:
        t = np.load(DATA / src)
        np.savez_compressed(
            DATA / dst, **{k: t[k][keep] for k in t.files}
        )
    print(f"wrote {int(keep.sum())}-tile crowded subsets to {DATA}")


def _load_run(outdir: Path):
    fl, wl, cl, il = [], [], [], []
    for p in sorted(outdir.glob("smc_batch*.npz")):
        d = np.load(p)
        fl.append(d["pruned_fluxes"])
        cl.append(d["counts"])
        wl.append(d["weights"] if "weights" in d else None)
    f = np.concatenate(fl)
    c = np.concatenate(cl)
    w = np.concatenate(wl) if wl[0] is not None else None
    return f, c, w


def _score(est_total, weights, truth_total):
    from smcdet_tpu.validation import (
        credible_interval_coverage,
        sbc_ranks,
        sbc_uniformity_pvalue,
    )

    ranks = sbc_ranks(truth_total, est_total, weights=weights)
    cov = credible_interval_coverage(
        truth_total, est_total, [0.5, 0.8, 0.95], weights=weights
    )
    return {
        "mean_sbc_rank": round(float(ranks.mean()), 4),
        "sbc_rank_stderr": round(
            float(ranks.std(ddof=1) / np.sqrt(ranks.size)), 4
        ),
        "sbc_ks_pvalue": round(sbc_uniformity_pvalue(ranks), 6),
        "coverage": {
            "0.5": round(float(cov[0]), 4),
            "0.8": round(float(cov[1]), 4),
            "0.95": round(float(cov[2]), 4),
        },
    }


def compare():
    exact_full = np.load(DATA / "tiles_exact.npz")
    keep = (exact_full["true_counts"] >= 3) & (exact_full["true_counts"] <= 4)
    truth_total = exact_full["true_fluxes"][keep].sum(-1)

    report = {"tiles": int(keep.sum()), "arms": {}}

    # base arm: the full seed2 run restricted to the crowded tiles
    base_dir = HERE / "output" / "m71_seed2"
    f, c, w = _load_run(base_dir)
    report["arms"]["base_n2048_s100"] = _score(
        f[keep].sum(-1), w[keep] if w is not None else None, truth_total
    )

    for name, outname in [
        ("hiN_n8192_s100", "m71_seed2_crowded_hiN"),
        ("hiS_n2048_s200", "m71_seed2_crowded_hiS"),
    ]:
        outdir = HERE / "output" / outname
        if not any(outdir.glob("smc_batch*.npz")):
            report["arms"][name] = "not run"
            continue
        f, c, w = _load_run(outdir)
        report["arms"][name] = _score(f.sum(-1), w, truth_total)

    RESULTS.mkdir(parents=True, exist_ok=True)
    out = RESULTS / "crowded_budget_probe.json"
    with open(out, "w") as fp:
        json.dump(report, fp, indent=2)
    print(json.dumps(report, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--make-subsets", action="store_true")
    ap.add_argument("--compare", action="store_true")
    args = ap.parse_args()
    if args.make_subsets:
        make_subsets()
    if args.compare:
        compare()
    if not (args.make_subsets or args.compare):
        ap.error("pass --make-subsets and/or --compare")
