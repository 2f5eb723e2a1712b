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
    kernel = build_kernel(cfg.kernel).replace(num_iters=1)
    mc_cfg = MCMCConfig(
        num_samples_total=args.num_samples,
        num_samples_burnin=args.burnin,
        keep_every_k=args.thin,
        flux_detection_threshold=cfg.sampler.flux_detection_threshold,
    )
    print(f"MCMC: {n} chains x {args.num_samples} samples ...")
    res = jax.block_until_ready(
        jax.jit(lambda k, im: run_mh(k, im, prior, model, kernel, mc_cfg))(
            jax.random.key(11), images
        )
    )

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

    report = {
        "images": int(n),
        "mcmc_samples": args.num_samples,
        "count_pmf_tvd": {
            "mean": round(float(tvd.mean()), 4),
            "median": round(float(np.median(tvd)), 4),
            "p90": round(float(np.quantile(tvd, 0.9)), 4),
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
    }
    with open(out_dir / "mcmc_comparison.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(9.2, 4.0))
    ax = axes[0]
    lim = max(mean_mc.max(), mean_smc.max()) * 1.05 + 0.1
    ax.plot([0, lim], [0, lim], color=NEUTRAL, linewidth=1, linestyle="--")
    ax.scatter(mean_smc, mean_mc, s=14, alpha=0.5, color=SMC_COLOR,
               linewidths=0)
    ax.set_xlabel("CS-SMC posterior mean count")
    ax.set_ylabel("MCMC posterior mean count")
    ax.set_title("Posterior mean pruned count", fontsize=11)
    ax.spines[["top", "right"]].set_visible(False)

    ax = axes[1]
    ax.hist(tvd, bins=np.linspace(0, max(0.3, tvd.max()), 25),
            color=SMC_COLOR, edgecolor="white", linewidth=0.8)
    ax.set_xlabel("TV distance between count pmfs")
    ax.set_ylabel("images")
    ax.set_title("CS-SMC vs MCMC count pmf", fontsize=11)
    ax.spines[["top", "right"]].set_visible(False)
    fig.suptitle(
        f"CS-SMC vs {args.num_samples//1000}k-sample MCMC on {n} images",
        fontsize=12,
    )
    fig.tight_layout()
    fig_dir = out_dir / "figures"
    fig_dir.mkdir(parents=True, exist_ok=True)
    fig.savefig(fig_dir / "mcmc_comparison.png", dpi=150)
    print(f"figure: {fig_dir / 'mcmc_comparison.png'}")


if __name__ == "__main__":
    main()
