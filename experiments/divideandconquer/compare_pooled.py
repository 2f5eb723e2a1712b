#!/usr/bin/env python
"""Pooled D&C vs single-tile comparison.

The count posterior p(s|x) is softmax(logZ); with finite particles the
per-run logZ noise (a few nats) makes each run's pmf overconfident, so
two independent pipelines can disagree by a full count on a single run
even when both are unbiased. Pooling R independent repetitions of each
pipeline estimates the *expected* posterior; agreement of the pooled
pmfs is the unbiasedness check for the aggregation tree.

Usage: python compare_pooled.py [--num-images 30] [--reps 4]
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-images", type=int, default=30)
    parser.add_argument("--reps", type=int, default=4)
    # bridge-effort knobs for the convergence study (VERDICT r3 task 2):
    # defaults reproduce the config.yaml round-3 settings
    parser.add_argument("--agg-iters", type=int, default=None)
    parser.add_argument("--relocate", type=int, default=None)
    parser.add_argument("--pair-sweeps", type=int, default=0)
    parser.add_argument("--suffix", type=str, default="")
    parser.add_argument(
        "--dump",
        action="store_true",
        help="also save the per-rep per-image count pmfs of both "
        "pipelines (pooled_pmfs<suffix>.npz) for per-image attribution "
        "of the cross-pipeline TVD",
    )
    parser.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (the axon TPU plugin overrides "
        "JAX_PLATFORMS, so an env var alone cannot)",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from smcdet_tpu.config import (
        build_image_model,
        build_kernel,
        build_prior,
        load_config,
    )
    from smcdet_tpu.inference.aggregate import Aggregate, expand_prior
    from smcdet_tpu.inference.smc import SMCConfig, SMCSampler, run_csmc

    here = Path(__file__).parent
    cfg = experiment_config(Path(__file__))
    st_cfg = load_config(here / "config_singletile.yaml")
    out_dir = Path(cfg.output_dir) / cfg.name
    tiles = np.load(out_dir / "tiles.npz")
    n = min(args.num_images, tiles["images"].shape[0])
    images = jnp.asarray(tiles["images"][:n], dtype=jnp.float32)

    prior = build_prior(cfg.prior)
    model = build_image_model(cfg.image_model)
    kernel = build_kernel(cfg.kernel)
    td = cfg.sampler.tile_dim
    tile_prior = expand_prior(prior, td, td, prior.max_objects)
    tile_model = model.replace(height=td, width=td)

    # single-tile pmfs: one batched run over all images per rep
    st_smc = SMCConfig(
        num_catalogs=st_cfg.sampler.num_catalogs,
        ess_threshold_prop=st_cfg.sampler.ess_threshold_prop,
        resample_method=st_cfg.sampler.resample_method,
        max_smc_iters=st_cfg.sampler.max_smc_iters,
        flux_detection_threshold=st_cfg.sampler.flux_detection_threshold,
    )
    run_st = jax.jit(
        lambda k, im: run_csmc(k, im, prior, model, kernel, st_smc)
    )

    K = 4 * prior.max_objects + 1

    def pmf_from(pc, w):
        pmf = np.zeros((pc.shape[0], K))
        for c in range(K):
            pmf[:, c] = ((pc == c) * w).sum(-1)
        return pmf / np.maximum(pmf.sum(-1, keepdims=True), 1e-12)

    st_pmfs, dc_pmfs = [], []
    for r in range(args.reps):
        res = jax.block_until_ready(run_st(jax.random.key(100 + r), images))
        st_pmfs.append(
            pmf_from(np.asarray(res.pruned_counts), np.asarray(res.weights))
        )
        print(f"single-tile rep {r} done", flush=True)

        dc_pmf = np.zeros((n, K))
        for i in range(n):
            s = SMCSampler(
                image=images[i],
                tile_dim=td,
                Prior=tile_prior,
                ImageModel=tile_model,
                MutationKernel=kernel,
                num_catalogs=cfg.sampler.num_catalogs,
                ess_threshold_prop=cfg.sampler.ess_threshold_prop,
                resample_method=cfg.sampler.resample_method,
                flux_detection_threshold=cfg.sampler.flux_detection_threshold,
                max_smc_iters=cfg.sampler.max_smc_iters,
            )
            s.run(jax.random.fold_in(jax.random.key(200 + r), i))
            agg_kwargs = dict(
                resample_method=cfg.aggregation.resample_method,
                ess_threshold_prop=cfg.aggregation.ess_threshold_prop,
                max_smc_iters=args.agg_iters or cfg.aggregation.max_smc_iters,
                pair_sweeps=args.pair_sweeps,
                # always pass the config value explicitly: omitting the
                # kwarg would use from_smc's hard default (8) and
                # silently ignore aggregation.relocate_sweeps, which the
                # production runner honors (runner.py)
                relocate_sweeps=(
                    args.relocate
                    if args.relocate is not None
                    else cfg.aggregation.relocate_sweeps
                ),
            )
            agg = Aggregate.from_smc(s, **agg_kwargs)
            agg.run(jax.random.fold_in(jax.random.key(300 + r), i))
            pc = np.asarray(agg.pruned_counts[0, 0])
            w = np.asarray(agg.state.weights[0, 0])
            dc_pmf[i] = pmf_from(pc[None], w[None])[0]
        dc_pmfs.append(dc_pmf)
        print(f"D&C rep {r} done", flush=True)

    st_single = st_pmfs[0]
    dc_single = dc_pmfs[0]
    st_pool = np.mean(st_pmfs, axis=0)
    dc_pool = np.mean(dc_pmfs, axis=0)
    # noise floors: TVD between two pooled halves of the SAME pipeline.
    # The D&C floor matters as much as the single-tile one — if the D&C
    # pipeline is noisier per rep, the pooled cross-pipeline TVD sits
    # above the single-tile floor even when the tree is unbiased.
    def self_halves(pmfs):
        if args.reps < 2:
            return None
        return 0.5 * np.abs(
            np.mean(pmfs[: args.reps // 2], axis=0)
            - np.mean(pmfs[args.reps // 2:], axis=0)
        ).sum(-1)

    st_half = self_halves(st_pmfs)
    dc_half = self_halves(dc_pmfs)
    # Expected cross-pipeline TVD if BOTH pipelines are unbiased. A
    # half-split floor compares two (reps/2)-pooled means: variance
    # 2 sigma^2/(reps/2) = 4 sigma^2/reps, so sigma^2 = reps/4 * half^2.
    # The cross comparison is between two reps-pooled means: variance
    # (sigma_st^2 + sigma_dc^2)/reps = (half_st^2 + half_dc^2)/4 —
    # i.e. HALF the quadrature sum (|noise| scales like its std).
    cross_floor = (
        0.5 * np.sqrt(st_half**2 + dc_half**2)
        if st_half is not None
        else None
    )

    def stats(tvd):
        return {
            "mean": round(float(tvd.mean()), 4),
            "median": round(float(np.median(tvd)), 4),
            "p90": round(float(np.quantile(tvd, 0.9)), 4),
        }

    tvd_single = 0.5 * np.abs(dc_single - st_single).sum(-1)
    tvd_pool = 0.5 * np.abs(dc_pool - st_pool).sum(-1)
    report = {
        "images": int(n),
        "reps": args.reps,
        "tvd_single_run": stats(tvd_single),
        "tvd_pooled": stats(tvd_pool),
        "mean_count_abs_diff_pooled": round(
            float(
                np.abs(
                    (dc_pool * np.arange(K)).sum(-1)
                    - (st_pool * np.arange(K)).sum(-1)
                ).mean()
            ),
            4,
        ),
    }
    report["bridge_effort"] = {
        "max_smc_iters": args.agg_iters or cfg.aggregation.max_smc_iters,
        "relocate_sweeps": (
            args.relocate
            if args.relocate is not None
            else cfg.aggregation.relocate_sweeps
        ),
        "pair_sweeps": args.pair_sweeps,
    }
    if st_half is not None:
        report["tvd_singletile_self_halves"] = stats(st_half)
        report["tvd_dc_self_halves"] = stats(dc_half)
        report["tvd_cross_floor_quadrature"] = stats(cross_floor)
    name = f"pooled_comparison{args.suffix}.json"
    with open(out_dir / name, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    if args.dump:
        np.savez_compressed(
            out_dir / f"pooled_pmfs{args.suffix}.npz",
            st_pmfs=np.asarray(st_pmfs),
            dc_pmfs=np.asarray(dc_pmfs),
            true_counts=np.asarray(tiles["true_counts"][:n]),
        )


if __name__ == "__main__":
    main()
