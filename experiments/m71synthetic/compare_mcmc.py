#!/usr/bin/env python
"""SMC-vs-MCMC posterior comparison (the reference's MCMC anchor).

The reference validates CS-SMC against a long single-site MH chain
(/root/reference/experiments/m71/run_mcmc.py:72-125, results_mcmc.ipynb):
the MCMC chain is the asymptotic ground truth for the per-tile posterior.
This script runs the saturated-model MH baseline on the first
``--num-images`` m71synthetic tiles (one batched ``lax.scan`` chain per
tile) and compares against the saved CS-SMC+aggregation posteriors:

- per-image total-variation distance between pruned-count pmfs;
- posterior-mean pruned count scatter (SMC vs MCMC);
- median total pruned flux agreement.

Outputs ``mcmc_comparison.json`` + ``figures/mcmc_comparison.png`` under
output/m71synthetic/.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from common import experiment_config

SMC_COLOR = "#2a78d6"
NEUTRAL = "#6b6b66"


def count_pmf(counts, weights, K):
    """Weighted pmf over 0..K-1 per image. counts [I, S], weights [I, S]."""
    pmf = np.zeros((counts.shape[0], K))
    for k in range(K):
        pmf[:, k] = ((counts == k) * weights).sum(-1)
    return pmf / pmf.sum(-1, keepdims=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-images", type=int, default=200)
    parser.add_argument("--num-samples", type=int, default=50_000)
    parser.add_argument("--burnin", type=int, default=30_000)
    parser.add_argument("--thin", type=int, default=2)
    parser.add_argument("--reps", type=int, default=1,
                        help="independent chains per image (pooled)")
    parser.add_argument(
        "--split-merge", action="store_true",
        help="enable the coordinated split/merge proposals in the RJ "
        "anchor (inference/transdimensional.py) — the cure for the "
        "bright-star split modes (see split_mode_study.py)",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from smcdet_tpu.config import (
        build_image_model,
        build_kernel,
        build_prior,
    )
    from smcdet_tpu.inference.mcmc import MCMCConfig, run_mh
    from smcdet_tpu.runner import load_results

    cfg = experiment_config(Path(__file__))
    out_dir = Path(cfg.output_dir) / cfg.name
    tiles = np.load(out_dir / "tiles.npz")
    smc = load_results(out_dir, "smc")

    n = min(args.num_images, smc["pruned_counts"].shape[0])
    images = jnp.asarray(tiles["images"][:n], dtype=jnp.float32)

    prior = build_prior(cfg.prior)
    model = build_image_model(cfg.image_model)
    # the reference's MCMC proposal scales (run_mcmc.py:113-115), not the
    # SMC mutation kernel's
    kernel = build_kernel(cfg.kernel).replace(
        num_iters=1,
        locs_stdev=jnp.float32(cfg.mcmc.locs_stdev),
        fluxes_stdev=jnp.float32(cfg.mcmc.fluxes_stdev),
    )
    mc_cfg = MCMCConfig(
        num_samples_total=args.num_samples,
        num_samples_burnin=args.burnin,
        keep_every_k=args.thin,
        flux_detection_threshold=cfg.sampler.flux_detection_threshold,
    )
    from smcdet_tpu.inference.mcmc import run_rjmh
    from smcdet_tpu.inference.transdimensional import BirthDeathMH

    rj_kernel = BirthDeathMH(
        num_iters=1,
        move=kernel,
        prob_split=0.15 if args.split_merge else 0.0,
        prob_merge=0.15 if args.split_merge else 0.0,
    )

    print(f"MCMC: {n} images x {args.reps} chains x {args.num_samples} samples ...")
    run = jax.jit(lambda k, im: run_mh(k, im, prior, model, kernel, mc_cfg))
    run_rj = jax.jit(
        lambda k, im: run_rjmh(k, im, prior, model, rj_kernel, mc_cfg)
    )
    # ``reps`` independent chains per image, pooled: replicate the image
    # batch with distinct keys, then fold the chain axis into the sample
    # axis. Pooling averages over which split-mode each chain falls into.
    def pooled(runner, key0):
        reps_counts, reps_fluxes, reps_acc = [], [], []
        for r in range(args.reps):
            res = jax.block_until_ready(runner(jax.random.key(key0 + r), images))
            reps_counts.append(np.asarray(res.pruned_counts))
            reps_fluxes.append(np.asarray(res.pruned_fluxes))
            reps_acc.append(np.asarray(res.acc_rate))

        class _Res:
            pruned_counts = np.concatenate(reps_counts, axis=1)
            pruned_fluxes = np.concatenate(reps_fluxes, axis=1)
            acc_rate = np.stack(reps_acc).mean(0)

        return _Res()

    res = pooled(run, 11)
    print("RJ-MH anchor ...")
    rj = pooled(run_rj, 1011)

    K = prior.max_objects + 2
    mc_counts = np.asarray(res.pruned_counts)  # [n, kept]
    mc_pmf = count_pmf(
        mc_counts, np.full(mc_counts.shape, 1.0 / mc_counts.shape[1]), K
    )
    smc_counts = smc["pruned_counts"][:n]
    smc_w = smc["weights"][:n]
    smc_pmf = count_pmf(smc_counts, smc_w, K)

    tvd = 0.5 * np.abs(mc_pmf - smc_pmf).sum(-1)
    mean_mc = (mc_pmf * np.arange(K)).sum(-1)
    mean_smc = (smc_pmf * np.arange(K)).sum(-1)

    rj_counts = np.asarray(rj.pruned_counts)
    rj_pmf = count_pmf(
        rj_counts, np.full(rj_counts.shape, 1.0 / rj_counts.shape[1]), K
    )
    rj_tvd = 0.5 * np.abs(rj_pmf - smc_pmf).sum(-1)
    mean_rj = (rj_pmf * np.arange(K)).sum(-1)

    mc_flux = np.asarray(res.pruned_fluxes).sum(-1)  # [n, kept]
    smc_flux = smc["pruned_fluxes"][:n].sum(-1)
    med_mc = np.median(mc_flux, axis=-1)
    med_smc = np.zeros(n)
    for i in range(n):
        order = np.argsort(smc_flux[i])
        cdf = np.cumsum(smc_w[i][order])
        med_smc[i] = smc_flux[i][order][
            np.searchsorted(cdf / cdf[-1], 0.5)
        ]

    # Stratify by MCMC mixing: single-site saturated MH is known to get
    # trapped in "split" modes on bright sources (several slots sharing one
    # star's flux; the reference's own MHsampler exhibits the identical
    # trap — see docs/results/RESULTS.md). Low acceptance flags those
    # chains, so report agreement both overall and on the well-mixed set.
    mixed = np.asarray(res.acc_rate) >= 0.15
    report = {
        "images": int(n),
        "mcmc_samples": args.num_samples,
        "mcmc_chains_per_image": args.reps,
        "count_pmf_tvd": {
            "mean": round(float(tvd.mean()), 4),
            "median": round(float(np.median(tvd)), 4),
            "p90": round(float(np.quantile(tvd, 0.9)), 4),
        },
        "well_mixed_chains": {
            "n": int(mixed.sum()),
            "acc_rate_threshold": 0.15,
            "count_pmf_tvd_mean": round(float(tvd[mixed].mean()), 4)
            if mixed.any()
            else None,
            "count_pmf_tvd_p90": round(float(np.quantile(tvd[mixed], 0.9)), 4)
            if mixed.any()
            else None,
        },
        "mean_count_agreement": {
            "max_abs_diff": round(float(np.abs(mean_mc - mean_smc).max()), 4),
            "mean_abs_diff": round(
                float(np.abs(mean_mc - mean_smc).mean()), 4
            ),
        },
        "median_total_flux_mean_abs_rel_diff": round(
            float(
                np.mean(
                    np.abs(med_mc - med_smc)
                    / np.maximum(np.maximum(med_mc, med_smc), 1e-3)
                )
            ),
            4,
        ),
        "mcmc_acc_rate_range": [
            round(float(np.asarray(res.acc_rate).min()), 3),
            round(float(np.asarray(res.acc_rate).max()), 3),
        ],
        # The framework's stronger anchor: a reversible-jump MH chain
        # (birth/death moves) that escapes the saturated sampler's split
        # modes. Close SMC agreement here isolates the plain-MH residual
        # as the plain chain's own mixing failure.
        "rjmh": {
            "count_pmf_tvd_mean": round(float(rj_tvd.mean()), 4),
            "count_pmf_tvd_median": round(float(np.median(rj_tvd)), 4),
            "count_pmf_tvd_p90": round(float(np.quantile(rj_tvd, 0.9)), 4),
            "mean_count_max_abs_diff": round(
                float(np.abs(mean_rj - mean_smc).max()), 4
            ),
            "mean_count_mean_abs_diff": round(
                float(np.abs(mean_rj - mean_smc).mean()), 4
            ),
        },
    }
    with open(out_dir / "mcmc_comparison.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(13.2, 4.0))
    ax = axes[0]
    lim = max(mean_mc.max(), mean_smc.max()) * 1.05 + 0.1
    ax.plot([0, lim], [0, lim], color=NEUTRAL, linewidth=1, linestyle="--")
    ax.scatter(mean_smc[mixed], mean_mc[mixed], s=14, alpha=0.5,
               color=SMC_COLOR, linewidths=0,
               label=f"well-mixed chain (n={int(mixed.sum())})")
    ax.scatter(mean_smc[~mixed], mean_mc[~mixed], s=14, alpha=0.5,
               color="#eb6834", linewidths=0,
               label=f"stuck chain, acc<0.15 (n={int((~mixed).sum())})")
    ax.legend(frameon=False, fontsize=8, loc="upper left")
    ax.set_xlabel("CS-SMC posterior mean count")
    ax.set_ylabel("plain MH posterior mean count")
    ax.set_title("Plain saturated MH (reference baseline)", fontsize=11)
    ax.spines[["top", "right"]].set_visible(False)

    ax = axes[1]
    lim = max(mean_rj.max(), mean_smc.max()) * 1.05 + 0.1
    ax.plot([0, lim], [0, lim], color=NEUTRAL, linewidth=1, linestyle="--")
    ax.scatter(mean_smc, mean_rj, s=14, alpha=0.5, color=SMC_COLOR,
               linewidths=0)
    ax.set_xlabel("CS-SMC posterior mean count")
    ax.set_ylabel("RJ-MH posterior mean count")
    ax.set_title("Reversible-jump MH (birth/death)", fontsize=11)
    ax.spines[["top", "right"]].set_visible(False)

    ax = axes[2]
    bins = np.linspace(0, max(0.3, tvd.max(), rj_tvd.max()), 25)
    ax.hist(tvd, bins=bins, color="#eb6834", edgecolor="white",
            linewidth=0.8, alpha=0.7, label="plain MH")
    ax.hist(rj_tvd, bins=bins, color=SMC_COLOR, edgecolor="white",
            linewidth=0.8, alpha=0.7, label="RJ-MH")
    ax.legend(frameon=False, fontsize=8)
    ax.set_xlabel("TV distance to CS-SMC count pmf")
    ax.set_ylabel("images")
    ax.set_title("Count-pmf agreement", fontsize=11)
    ax.spines[["top", "right"]].set_visible(False)
    fig.suptitle(
        f"CS-SMC vs {args.num_samples//1000}k-sample MCMC anchors on {n} images",
        fontsize=12,
    )
    fig.tight_layout()
    fig_dir = out_dir / "figures"
    fig_dir.mkdir(parents=True, exist_ok=True)
    fig.savefig(fig_dir / "mcmc_comparison.png", dpi=150)
    print(f"figure: {fig_dir / 'mcmc_comparison.png'}")


if __name__ == "__main__":
    main()
