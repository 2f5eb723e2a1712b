#!/usr/bin/env python
"""MH vs MALA mutation-kernel comparison (the deprecated jsm2024
experiments' question — run_smc_mh.py vs run_smc_mala.py — on the basic
suite's model).

Runs CS-SMC over the same simulated tiles with the random-walk
single-component MH kernel and with the Langevin (MALA) kernel, and
reports per-kernel acceptance, SMC iteration counts, wall time, and the
agreement of the two posteriors (count pmf TVD + posterior-mean total
flux). Writes ``kernel_comparison.json`` under output/basic/.

Usage: python compare_kernels.py [--num-images 100] [--num-catalogs 512]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from common import experiment_config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-images", type=int, default=100)
    parser.add_argument("--num-catalogs", type=int, default=512)
    parser.add_argument("--mala-locs-step", type=float, default=0.05)
    parser.add_argument("--mala-fluxes-step", type=float, default=20.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from smcdet_tpu.config import build_image_model, build_prior
    from smcdet_tpu.inference.kernels import (
        SingleComponentMALA,
        SingleComponentMH,
    )
    from smcdet_tpu.inference.smc import SMCConfig, run_csmc

    cfg = experiment_config(Path(__file__))
    out_dir = Path(cfg.output_dir) / cfg.name
    tiles = np.load(out_dir / "tiles.npz")
    n = min(args.num_images, tiles["images"].shape[0])
    images = jnp.asarray(tiles["images"][:n], dtype=jnp.float32)

    prior = build_prior(cfg.prior)
    model = build_image_model(cfg.image_model)
    k = cfg.kernel
    kernels = {
        "mh": SingleComponentMH(
            num_iters=k.num_iters,
            locs_stdev=jnp.float32(k.locs_stdev),
            fluxes_stdev=jnp.float32(k.fluxes_stdev),
            fluxes_min=jnp.float32(k.fluxes_min),
            fluxes_max=jnp.float32(k.fluxes_max),
        ),
        "mala": SingleComponentMALA(
            num_iters=k.num_iters,
            locs_step=jnp.float32(args.mala_locs_step),
            fluxes_step=jnp.float32(args.mala_fluxes_step),
            fluxes_min=jnp.float32(k.fluxes_min),
            fluxes_max=jnp.float32(k.fluxes_max),
        ),
    }
    smc_cfg = SMCConfig(
        num_catalogs=args.num_catalogs,
        ess_threshold_prop=cfg.sampler.ess_threshold_prop,
        resample_method=cfg.sampler.resample_method,
        max_smc_iters=cfg.sampler.max_smc_iters,
        flux_detection_threshold=cfg.sampler.flux_detection_threshold,
    )

    K = prior.max_objects + 2
    results, pmfs = {}, {}
    for name, kernel in kernels.items():
        run = jax.jit(
            lambda key, im, kn=kernel: run_csmc(
                key, im, prior, model, kn, smc_cfg
            )
        )
        jax.block_until_ready(run(jax.random.key(0), images))  # compile
        start = time.perf_counter()
        res = jax.block_until_ready(run(jax.random.key(1), images))
        wall = time.perf_counter() - start
        pc = np.asarray(res.pruned_counts)
        w = np.asarray(res.weights)
        pmf = np.zeros((n, K))
        for c in range(K):
            pmf[:, c] = ((pc == c) * w).sum(-1)
        pmfs[name] = pmf / np.maximum(pmf.sum(-1, keepdims=True), 1e-12)
        results[name] = {
            "wall_s": round(wall, 2),
            "smc_iterations": int(res.num_iters),
            "acceptance_rate_mean": round(
                float(np.asarray(res.acc_rate).mean()), 4
            ),
            "mean_total_flux": round(
                float((np.asarray(res.pruned_fluxes).sum(-1) * w).sum(-1).mean()),
                2,
            ),
        }
        print(name, results[name], flush=True)

    tvd = 0.5 * np.abs(pmfs["mh"] - pmfs["mala"]).sum(-1)
    report = {
        "images": int(n),
        "num_catalogs": args.num_catalogs,
        "kernels": results,
        "count_pmf_tvd": {
            "mean": round(float(tvd.mean()), 4),
            "median": round(float(np.median(tvd)), 4),
            "p90": round(float(np.quantile(tvd, 0.9)), 4),
        },
    }
    with open(out_dir / "kernel_comparison.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
