#!/usr/bin/env python
"""Results analysis: the reference's results notebooks as a script.

Computes, from a finished experiment's artifacts
(``output/<name>/smc_batch*.npz`` + ``tiles.npz``):

- posterior count confusion matrix + symmetry (results.ipynb cells 29-34);
- credible-interval coverage of total flux (cells 35-36);
- SBC rank uniformity (cell 40);
- detection precision/recall/F1 vs the truth via Hungarian matching
  (cells 45-47), including the tuned extractor baseline when
  ``sep_results.npz`` exists;
- runtime summary (cell 56).

Usage: python experiments/analyze.py output/<name> [--mag-bins 15 18 21 24]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("results_dir")
    parser.add_argument("--method", default="smc")
    parser.add_argument(
        "--mag-bins", type=float, nargs="+", default=[15.0, 18.0, 21.0, 24.0]
    )
    parser.add_argument("--num-match", type=int, default=50)
    parser.add_argument("--locs-tol", type=float, default=0.5)
    parser.add_argument("--mags-tol", type=float, default=0.5)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from smcdet_tpu.metrics import compute_precision_recall_f1, match_catalogs
    from smcdet_tpu.runner import load_results
    from smcdet_tpu.validation import (
        confusion_asymmetry,
        count_confusion_matrix,
        credible_interval_coverage,
        sbc_ranks,
        sbc_uniformity_pvalue,
    )

    out_dir = Path(args.results_dir)
    res = load_results(out_dir, args.method)
    tiles_path = out_dir / "tiles.npz"
    if not tiles_path.exists():
        raise FileNotFoundError(
            f"{tiles_path} missing — run generate_images.py (or prepare_data)"
        )
    tiles = np.load(tiles_path)
    n = res["counts"].shape[0]
    truth_counts = tiles["true_counts"][:n]
    truth_locs = tiles["true_locs"][:n]
    truth_fluxes = tiles["true_fluxes"][:n]

    report = {"images": int(n)}

    weights = res.get("weights")
    est_counts = res["pruned_counts"]
    M = count_confusion_matrix(truth_counts, est_counts, weights=weights)
    report["count_confusion"] = np.round(M, 4).tolist()
    report["confusion_asymmetry"] = round(confusion_asymmetry(M), 4)
    report["count_accuracy"] = round(float(np.trace(M)), 4)

    truth_total = truth_fluxes.sum(-1)
    est_total = res["pruned_fluxes"].sum(-1)
    levels = [0.5, 0.8, 0.95]
    cov = credible_interval_coverage(
        truth_total, est_total, levels, weights=weights
    )
    report["total_flux_coverage"] = {
        str(l): round(float(c), 4) for l, c in zip(levels, cov)
    }
    ranks = sbc_ranks(truth_total, est_total, weights=weights)
    report["sbc_total_flux_ks_pvalue"] = round(sbc_uniformity_pvalue(ranks), 5)

    mc = match_catalogs(
        jax.random.key(0),
        jnp.asarray(truth_counts),
        jnp.asarray(truth_locs),
        jnp.asarray(np.maximum(truth_fluxes, 1e-6)),
        jnp.asarray(res["pruned_counts"]),
        jnp.asarray(res["pruned_locs"]),
        jnp.asarray(np.maximum(res["pruned_fluxes"], 1e-6)),
        num_est_catalogs_to_match=args.num_match,
        locs_tol=args.locs_tol,
        mags_tol=args.mags_tol,
        mag_bins=jnp.asarray(args.mag_bins),
        est_weights=jnp.asarray(weights) if weights is not None else None,
    )
    p, r, f1 = compute_precision_recall_f1(mc)
    report["detection"] = {
        "precision_by_bin": np.round(np.asarray(p).mean(0), 4).tolist(),
        "recall_by_bin": np.round(np.asarray(r).mean(0), 4).tolist(),
        "f1_by_bin": np.round(np.asarray(f1).mean(0), 4).tolist(),
    }

    sep_path = out_dir / "sep_results.npz"
    if sep_path.exists():
        sep = np.load(sep_path)
        ns = sep["counts"].shape[0]
        mc_sep = match_catalogs(
            jax.random.key(1),
            jnp.asarray(tiles["true_counts"][1::2][:ns]),
            jnp.asarray(tiles["true_locs"][1::2][:ns]),
            jnp.asarray(np.maximum(tiles["true_fluxes"][1::2][:ns], 1e-6)),
            jnp.asarray(sep["counts"])[:, None],
            jnp.asarray(sep["locs"])[:, None],
            jnp.asarray(np.maximum(sep["fluxes"], 1e-6))[:, None],
            num_est_catalogs_to_match=1,
            locs_tol=args.locs_tol,
            mags_tol=args.mags_tol,
            mag_bins=jnp.asarray(args.mag_bins),
        )
        _, _, f1s = compute_precision_recall_f1(mc_sep)
        report["sep_baseline_f1_by_bin"] = np.round(
            np.asarray(f1s).mean(0), 4
        ).tolist()

    report["runtime_s"] = {
        "total": round(float(res["runtime"].sum()), 2),
        "per_batch_mean": round(float(res["runtime"].mean()), 2),
    }

    print(json.dumps(report, indent=2))
    with open(out_dir / f"{args.method}_analysis.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
