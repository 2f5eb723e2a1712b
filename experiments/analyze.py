#!/usr/bin/env python
"""Results analysis: the reference's results notebooks as a script.

Computes, from a finished experiment's artifacts
(``output/<name>/smc_batch*.npz`` + ``tiles.npz``):

- posterior count confusion matrix + symmetry (results.ipynb cells 29-34);
- credible-interval coverage of total flux (cells 35-36);
- SBC rank uniformity (cell 40);
- detection precision/recall/F1 vs the truth via Hungarian matching,
  with bootstrap confidence intervals over images (cells 45-47),
  including the tuned extractor baseline when ``sep_results.npz`` exists;
- runtime summary + runtime-vs-count (cell 56);
- publication figures for all of the above (``figures/*.png``).

Usage: python experiments/analyze.py output/<name> [--mag-bins 15 18 21 24]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

COVERAGE_LEVELS = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95]


def bootstrap_prf(mc, n_boot: int, seed: int = 0):
    """Bootstrap P/R/F1 over images (the tile axis of ``MatchCounts``).

    Resampling T images with replacement is equivalent to drawing
    multinomial weights over images and re-doing the sum-over-images in
    compute_precision_recall_f1 — one [n_boot, T] x [T, S*B] matmul
    instead of materializing resampled count arrays
    (results.ipynb cells 45-47 semantics).

    Returns ``{metric: [n_boot, n_bins]}`` with the sampled-catalog axis
    already averaged out.
    """
    tt = np.asarray(mc.num_true_total, dtype=np.float64)
    tm = np.asarray(mc.num_true_matches, dtype=np.float64)
    et = np.asarray(mc.num_est_total, dtype=np.float64)
    em = np.asarray(mc.num_est_matches, dtype=np.float64)
    T = tt.shape[0]
    rng = np.random.default_rng(seed)
    w = rng.multinomial(T, np.full(T, 1.0 / T), size=n_boot).astype(np.float64)

    def agg(a):  # [T, S, B] -> [n_boot, S, B]
        return np.tensordot(w, a.reshape(T, -1), axes=(1, 0)).reshape(
            (n_boot,) + a.shape[1:]
        )

    btt, btm, bet, bem = agg(tt), agg(tm), agg(et), agg(em)
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.nan_to_num(bem / bet)
        recall = np.nan_to_num(btm / btt)
        f1 = np.nan_to_num(2 * precision * recall / (precision + recall))
    return {
        "precision": precision.mean(1),
        "recall": recall.mean(1),
        "f1": f1.mean(1),
    }


def ci_summary(point, boot, alpha=0.05):
    """``[3, n_bins]`` (lo, point, hi) from a bootstrap sample."""
    lo = np.quantile(boot, alpha / 2, axis=0)
    hi = np.quantile(boot, 1 - alpha / 2, axis=0)
    return np.stack([lo, np.asarray(point), hi])


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
    parser.add_argument("--bootstrap", type=int, default=1000)
    parser.add_argument("--no-figures", action="store_true")
    parser.add_argument(
        "--tiles",
        default=None,
        help="override the truth-tiles artifact (default: "
        "<results_dir>/tiles.npz); e.g. the scatter-free tiles_exact.npz "
        "variant — the estimator results are reused, only the truth "
        "changes",
    )
    parser.add_argument(
        "--out-suffix",
        default="",
        help="suffix for the analysis JSON / figure dir so a truth-variant "
        "analysis does not overwrite the main one",
    )
    args = parser.parse_args()
    if args.tiles and not args.out_suffix:
        stem = Path(args.tiles).stem
        if stem != "tiles":
            # a truth-VARIANT analysis must never silently overwrite the
            # primary <method>_analysis.json that every queue/compare
            # script reads — derive a suffix from the artifact name.
            # Pointing --tiles at a primary "tiles.npz" (e.g. a variant
            # run whose truth lives under data_<variant>/m71/) IS the
            # primary analysis and keeps the unsuffixed name.
            args.out_suffix = "_" + stem.removeprefix("tiles_")
            print(
                f"--tiles given without --out-suffix: writing with "
                f"derived suffix {args.out_suffix!r} to protect the "
                f"primary analysis"
            )

    import os

    import jax

    # Analysis-scale matching (hundreds of tiles) runs in seconds on CPU;
    # on the tunneled TPU the Hungarian batch costs a many-minute compile
    # and has crashed the remote worker at full experiment size. Opt back
    # in with SMCDET_ANALYZE_TPU=1.
    if os.environ.get("SMCDET_ANALYZE_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
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
    tiles_path = Path(args.tiles) if args.tiles else out_dir / "tiles.npz"
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
    # Coverage over images with at least one true source, mirroring the
    # reference (m71synthetic results.ipynb cell 39: pruned_counts > 0) —
    # zero-truth images put a posterior atom exactly at the true value,
    # which trivially covers at every level and distorts the curve.
    nz = truth_counts > 0
    cov = credible_interval_coverage(
        truth_total[nz],
        est_total[nz],
        COVERAGE_LEVELS,
        weights=weights[nz] if weights is not None else None,
    )
    report["total_flux_coverage"] = {
        str(l): round(float(c), 4) for l, c in zip(COVERAGE_LEVELS, cov)
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
    point = {
        "precision": np.asarray(p).mean(0),
        "recall": np.asarray(r).mean(0),
        "f1": np.asarray(f1).mean(0),
    }
    boot = bootstrap_prf(mc, args.bootstrap)
    smc_ci = {m: ci_summary(point[m], boot[m]) for m in point}
    report["detection"] = {
        f"{m}_by_bin": {
            "point": np.round(smc_ci[m][1], 4).tolist(),
            "ci95_lo": np.round(smc_ci[m][0], 4).tolist(),
            "ci95_hi": np.round(smc_ci[m][2], 4).tolist(),
        }
        for m in ("precision", "recall", "f1")
    }

    sep_ci = None
    sep_path = out_dir / "sep_results.npz"
    if sep_path.exists():
        sep = np.load(sep_path)
        if "eval_true_counts" not in sep:
            # artifact predates the embedded eval-tile truth: skip the
            # baseline comparison rather than crash the whole analysis
            print(
                f"warning: {sep_path} has no eval_true_* arrays "
                "(pre-update artifact) — re-run run_sep.py for the "
                "baseline comparison; skipping it",
                file=sys.stderr,
            )
            sep = None
    else:
        sep = None
    if sep is not None:
        ns = sep["counts"].shape[0]
        # truth for the evaluated tiles rides in the SEP artifact itself
        # (detect/baseline.py), valid for both the checkerboard and the
        # even/odd split conventions
        mc_sep = match_catalogs(
            jax.random.key(1),
            jnp.asarray(sep["eval_true_counts"]),
            jnp.asarray(sep["eval_true_locs"]),
            jnp.asarray(np.maximum(sep["eval_true_fluxes"], 1e-6)),
            jnp.asarray(sep["counts"])[:, None],
            jnp.asarray(sep["locs"])[:, None],
            jnp.asarray(np.maximum(sep["fluxes"], 1e-6))[:, None],
            num_est_catalogs_to_match=1,
            locs_tol=args.locs_tol,
            mags_tol=args.mags_tol,
            mag_bins=jnp.asarray(args.mag_bins),
        )
        ps, rs, f1s = compute_precision_recall_f1(mc_sep)
        sep_point = {
            "precision": np.asarray(ps).mean(0),
            "recall": np.asarray(rs).mean(0),
            "f1": np.asarray(f1s).mean(0),
        }
        sep_boot = bootstrap_prf(mc_sep, args.bootstrap, seed=1)
        sep_ci = {m: ci_summary(sep_point[m], sep_boot[m]) for m in sep_point}
        report["sep_baseline"] = {
            f"{m}_by_bin": {
                "point": np.round(sep_ci[m][1], 4).tolist(),
                "ci95_lo": np.round(sep_ci[m][0], 4).tolist(),
                "ci95_hi": np.round(sep_ci[m][2], 4).tolist(),
            }
            for m in ("precision", "recall", "f1")
        }

        # head-to-head on the identical eval tiles: restrict the SMC
        # detection metrics to the SEP eval subset (results.ipynb cells
        # 45-47 compare both methods over the same 332 eval cutouts)
        if "eval_indices" in sep:
            idx = np.asarray(sep["eval_indices"])
            idx = idx[idx < n][:ns]
            mc_eval = match_catalogs(
                jax.random.key(2),
                jnp.asarray(truth_counts[idx]),
                jnp.asarray(truth_locs[idx]),
                jnp.asarray(np.maximum(truth_fluxes[idx], 1e-6)),
                jnp.asarray(res["pruned_counts"][idx]),
                jnp.asarray(res["pruned_locs"][idx]),
                jnp.asarray(np.maximum(res["pruned_fluxes"][idx], 1e-6)),
                num_est_catalogs_to_match=args.num_match,
                locs_tol=args.locs_tol,
                mags_tol=args.mags_tol,
                mag_bins=jnp.asarray(args.mag_bins),
                est_weights=(
                    jnp.asarray(weights[idx]) if weights is not None else None
                ),
            )
            pe, re_, f1e = compute_precision_recall_f1(mc_eval)
            eval_point = {
                "precision": np.asarray(pe).mean(0),
                "recall": np.asarray(re_).mean(0),
                "f1": np.asarray(f1e).mean(0),
            }
            eval_boot = bootstrap_prf(mc_eval, args.bootstrap, seed=2)
            report["detection_eval_subset"] = {
                "images": int(idx.size),
                **{
                    f"{m}_by_bin": {
                        "point": np.round(eval_point[m], 4).tolist(),
                        "ci95_lo": np.round(
                            ci_summary(eval_point[m], eval_boot[m])[0], 4
                        ).tolist(),
                        "ci95_hi": np.round(
                            ci_summary(eval_point[m], eval_boot[m])[2], 4
                        ).tolist(),
                    }
                    for m in ("precision", "recall", "f1")
                },
            }

    runtimes_per_image = res.get("runtime_per_image")
    report["runtime_s"] = {
        "total": round(float(res["runtime"].sum()), 2),
        "per_batch_mean": round(float(res["runtime"].mean()), 2),
    }
    if runtimes_per_image is not None:
        report["runtime_s"]["per_image_mean"] = round(
            float(np.mean(runtimes_per_image)), 4
        )
        report["runtime_s"]["per_image_max"] = round(
            float(np.max(runtimes_per_image)), 4
        )

    if not args.no_figures:
        from figures import save_all

        # detected stars per mag bin: truth, posterior spread, extractor
        # (results.ipynb cell 57). The SEP run covers the odd-index eval
        # half only, so scale truth/SMC by the matched image subsets.
        true_binned = np.asarray(mc.num_true_total)[:, 0, :].sum(0)
        est_binned = np.asarray(mc.num_est_total).sum(0)  # [S, B]
        classified = (true_binned, est_binned)

        fig_names = save_all(
            # per-method figure dir so a baseline analysis (--method mcmc)
            # doesn't overwrite the smc figures
            out_dir
            / (
                ("figures" if args.method == "smc" else f"figures_{args.method}")
                + args.out_suffix
            ),
            mag_bins=args.mag_bins,
            smc_ci=smc_ci,
            sep_ci=sep_ci,
            confusion=M,
            levels=COVERAGE_LEVELS,
            coverage=cov,
            n_images=int(nz.sum()),
            ranks=ranks,
            true_counts=truth_counts,
            runtimes=runtimes_per_image,
            classified=classified,
        )
        report["figures"] = fig_names

    print(json.dumps(report, indent=2))
    with open(
        out_dir / f"{args.method}_analysis{args.out_suffix}.json", "w"
    ) as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
