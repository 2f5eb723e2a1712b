#!/usr/bin/env python
"""Bisect the reproducible cells_pair batch-7 TPU fault (VERDICT r4 #2).

`run_smc.py --config config_pair.yaml` died twice at batch 7 (images
70-79) with ``UNAVAILABLE: TPU device error — often a kernel fault``
(/tmp/r4b_queue.log). This driver reproduces that batch in isolation
and bisects: pair sweeps on/off, then per-image, so the faulting
(program, data) pair is pinned before reading any kernel code too hard.

Usage:
  python diag_pair_fault.py --pair-sweeps 8            # full batch 7
  python diag_pair_fault.py --pair-sweeps 0            # control arm
  python diag_pair_fault.py --pair-sweeps 8 --image 3  # single image
  python diag_pair_fault.py ... --cpu                  # CPU semantics run
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pair-sweeps", type=int, default=8)
    parser.add_argument("--batch", type=int, default=7)
    parser.add_argument("--image", type=int, default=None,
                        help="single image index WITHIN the batch "
                        "(still run at batch shape by duplication, so "
                        "the compiled program is identical)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from smcdet_tpu.config import (
        build_image_model,
        build_kernel,
        build_prior,
        load_config,
    )
    from smcdet_tpu.inference.smc import SMCConfig, run_csmc, run_csmc_chunked

    here = Path(__file__).parent
    cfg = load_config(here / "config_pair.yaml")
    tiles = np.load(here / cfg.data_path)
    lo = args.batch * cfg.batch_size
    imgs = jnp.asarray(
        tiles["images"][lo : lo + cfg.batch_size], dtype=jnp.float32
    )
    print(f"batch {args.batch}: images[{lo}:{lo + cfg.batch_size}] "
          f"shape {imgs.shape}; per-image totals "
          f"{np.asarray(imgs.sum((1, 2))).round(0)}", flush=True)
    if args.image is not None:
        imgs = jnp.broadcast_to(
            imgs[args.image : args.image + 1], imgs.shape
        )
        print(f"duplicating image {args.image} (global {lo + args.image}) "
              "across the batch", flush=True)

    prior = build_prior(cfg.prior)
    model = build_image_model(cfg.image_model)
    kernel = build_kernel(cfg.kernel)
    smc_cfg = SMCConfig(
        num_catalogs=cfg.sampler.num_catalogs,
        ess_threshold_prop=cfg.sampler.ess_threshold_prop,
        resample_method=cfg.sampler.resample_method,
        max_smc_iters=cfg.sampler.max_smc_iters,
        flux_detection_threshold=cfg.sampler.flux_detection_threshold,
        relocate_sweeps=cfg.sampler.relocate_sweeps,
        pair_sweeps=args.pair_sweeps,
        dispatch_iters=cfg.sampler.dispatch_iters,
    )
    key = jax.random.fold_in(jax.random.key(cfg.seed), args.batch)

    t0 = time.time()
    result = run_csmc_chunked(
        key, imgs, prior, model, kernel, smc_cfg,
        run=jax.jit(run_csmc), sort_tiles=cfg.sampler.sort_tiles,
    )
    jax.block_until_ready(result)
    print(
        f"OK in {time.time() - t0:.0f}s: iters={int(result.num_iters)} "
        f"temp_max_err={float(jnp.max(jnp.abs(result.temperature - 1.0))):.2e} "
        f"min_ess={float(jnp.min(result.ess)):.0f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
