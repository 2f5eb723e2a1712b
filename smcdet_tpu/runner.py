"""Batch experiment runner with checkpoint/resume.

Re-design of the reference experiment drivers
(/root/reference/experiments/*/run_smc.py, run_mcmc.py,
generate_images.py): simulate or load tiles, run per-batch inference
(CS-SMC, optionally + aggregation, or the MH baseline), and write one
``.npz`` artifact per batch. A crashed job resumes by skipping batches
whose artifact already exists — the reference's batch-shard pattern
(run_smc.py:105-181, run_mcmc.py:84-89) made first-class, including the
``BATCH_INDEX``-style job sharding via ``job_index`` / ``num_jobs``.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from smcdet_tpu.config import (
    ExperimentConfig,
    build_image_model,
    build_kernel,
    build_prior,
)
from smcdet_tpu.inference.smc import SMCConfig, run_csmc
from smcdet_tpu.models.simulate import generate_images

__all__ = ["simulate_tiles", "run_experiment", "load_results"]


def simulate_tiles(cfg: ExperimentConfig, key=None):
    """Simulate the experiment's tiles from its own generative model
    (generate_images.py parity). Returns a dict of arrays."""
    if key is None:
        key = jax.random.key(cfg.seed)
    prior = build_prior(cfg.prior)
    model = build_image_model(cfg.image_model)
    sim = generate_images(
        key,
        prior,
        model,
        flux_threshold=cfg.sampler.flux_detection_threshold,
        loc_threshold_lower=0.0,
        loc_threshold_upper=float(cfg.image_model.image_height),
        num_images=cfg.num_images,
    )
    return {
        "images": np.asarray(sim.images),
        "true_counts": np.asarray(sim.pruned_counts),
        "true_locs": np.asarray(sim.pruned_locs),
        "true_fluxes": np.asarray(sim.pruned_fluxes),
        "unpruned_counts": np.asarray(sim.unpruned_counts),
        "unpruned_locs": np.asarray(sim.unpruned_locs),
        "unpruned_fluxes": np.asarray(sim.unpruned_fluxes),
    }


def _load_tiles(cfg: ExperimentConfig):
    """Tiles come from (in order): an explicit ``data_path``, a staged
    ``tiles.npz`` written by ``generate_images.py``, or a fresh
    simulation."""
    path = (
        Path(cfg.data_path)
        if cfg.data_path is not None
        else Path(cfg.output_dir) / cfg.name / "tiles.npz"
    )
    if path.exists():
        data = np.load(path)
        return {k: data[k] for k in data.files}
    if cfg.data_path is not None:
        raise FileNotFoundError(
            f"{path} not found — run the experiment's data-prep step first"
        )
    return simulate_tiles(cfg)


def _make_smc_aggregate_runner(cfg, prior, model, kernel, smc_cfg):
    """Per-image pipeline: tile -> CS-SMC -> divide-and-conquer aggregate
    (the reference's run_smc.py:124-156 flow). Each image in the batch is
    processed independently; results are whole-image catalogs stacked over
    the batch."""
    from smcdet_tpu.inference.aggregate import Aggregate, expand_prior
    from smcdet_tpu.inference.smc import SMCSampler

    # the config describes the full image; per-tile SMC needs tile-level
    # objects (count-prior rate rescaled to the padded tile area)
    td = cfg.sampler.tile_dim
    tile_prior = expand_prior(prior, td, td, prior.max_objects)
    tile_model = model.replace(height=td, width=td)

    warmed = {"done": False}
    replicates = getattr(cfg.sampler, "replicates", 1)

    def run(key, imgs, bkgs=None):
        outs = []
        per_image_s = []

        def process_once(i, r):
            k_smc, k_agg = jax.random.split(
                jax.random.fold_in(jax.random.fold_in(key, i), r)
            )
            if bkgs is None:
                model_i = tile_model
            else:
                # per-image background map, tiled exactly like the image
                # (tile_image row-major order). Single-tile images keep
                # the bare [h, w] map so the jit cache shape matches the
                # scalar-background path; multi-tile images get a
                # per-tile [T, 1, 1, h, w] map broadcasting over the
                # [C, N] particle batch dims.
                from smcdet_tpu.inference.smc import tile_image

                th = imgs[i].shape[0] // td
                tw = imgs[i].shape[1] // td
                bmap = tile_image(jnp.asarray(bkgs[i]), th, tw, td)
                model_i = tile_model.replace(
                    background=bmap[0] if th * tw == 1
                    else bmap[:, None, None]
                )
            sampler = SMCSampler(
                image=imgs[i],
                tile_dim=td,
                Prior=tile_prior,
                ImageModel=model_i,
                MutationKernel=kernel,
                num_catalogs=smc_cfg.num_catalogs,
                ess_threshold_prop=smc_cfg.ess_threshold_prop,
                resample_method=smc_cfg.resample_method,
                flux_detection_threshold=smc_cfg.flux_detection_threshold,
                max_smc_iters=smc_cfg.max_smc_iters,
                relocate_sweeps=smc_cfg.relocate_sweeps,
                pair_sweeps=smc_cfg.pair_sweeps,
                dispatch_iters=smc_cfg.dispatch_iters,
            )
            sampler.run(k_smc)
            agg = Aggregate.from_smc(
                sampler,
                resample_method=cfg.aggregation.resample_method,
                ess_threshold_prop=cfg.aggregation.ess_threshold_prop,
                max_smc_iters=cfg.aggregation.max_smc_iters,
                max_objects_cap=cfg.aggregation.max_objects_cap,
                relocate_sweeps=cfg.aggregation.relocate_sweeps,
                pair_sweeps=cfg.aggregation.pair_sweeps,
            )
            agg.run(k_agg)
            jax.block_until_ready(agg.state.counts)
            return agg

        def process(i):
            """One image: ``replicates`` independent runs pooled into one
            particle set. log_z pools by log-mean-exp (the unbiasedness of
            each run's per-count normalising-constant estimate is
            preserved, with 1/R the variance), which directly de-noises
            the count pmf softmax(log_z)."""
            aggs = [process_once(i, r) for r in range(replicates)]
            if replicates == 1:
                agg = aggs[0]
                return {
                    "counts": agg.state.counts[0, 0],
                    "locs": agg.state.locs[0, 0],
                    "fluxes": agg.state.fluxes[0, 0],
                    "pruned_counts": agg.pruned_counts[0, 0],
                    "pruned_locs": agg.pruned_locs[0, 0],
                    "pruned_fluxes": agg.pruned_fluxes[0, 0],
                    "weights": agg.state.weights[0, 0],
                    "log_normalizing_constant": agg.state.log_z[0, 0],
                }
            cat = lambda f: jnp.concatenate(  # noqa: E731
                [f(a) for a in aggs], axis=0
            )
            from jax.scipy.special import logsumexp

            log_z = logsumexp(
                jnp.stack([a.state.log_z[0, 0] for a in aggs]), axis=0
            ) - jnp.log(float(replicates))
            return {
                "counts": cat(lambda a: a.state.counts[0, 0]),
                "locs": cat(lambda a: a.state.locs[0, 0]),
                "fluxes": cat(lambda a: a.state.fluxes[0, 0]),
                "pruned_counts": cat(lambda a: a.pruned_counts[0, 0]),
                "pruned_locs": cat(lambda a: a.pruned_locs[0, 0]),
                "pruned_fluxes": cat(lambda a: a.pruned_fluxes[0, 0]),
                "weights": cat(lambda a: a.state.weights[0, 0])
                / float(replicates),
                "log_normalizing_constant": log_z,
            }

        for i in range(imgs.shape[0]):
            if not warmed["done"]:
                # jit-compile the whole pipeline untimed so the first
                # image's recorded runtime is steady-state, not compile
                process_once(i, 0)
                warmed["done"] = True
            start = time.perf_counter()
            out = process(i)
            per_image_s.append(time.perf_counter() - start)
            outs.append(out)
        stacked = {
            k: jnp.stack([o[k] for o in outs]) for k in outs[0]
        }
        stacked["runtime_per_image"] = jnp.asarray(per_image_s)
        from collections import namedtuple

        Result = namedtuple("AggregatedResult", sorted(stacked))
        return Result(**{k: stacked[k] for k in sorted(stacked)})

    return run


def run_experiment(
    cfg: ExperimentConfig,
    method: str = "smc",
    job_index: int = 0,
    num_jobs: int = 1,
    verbose: bool = True,
):
    """Run ``method`` ("smc" | "mcmc") over the experiment's images in
    batches, saving ``{output_dir}/{name}/{method}_batch{b:04d}.npz``.

    Batches are distributed round-robin over ``num_jobs`` jobs; existing
    artifacts are skipped (resume). In a multi-process (multi-host) run
    with no explicit ``num_jobs``, each process automatically takes its
    ``jax.process_index()``-th shard (parallel/distributed.py — the
    reference's BATCH_INDEX pattern, run_mcmc.py:84-89, made automatic).
    """
    from smcdet_tpu.parallel.distributed import host_shard

    job_index, num_jobs = host_shard(job_index, num_jobs)
    out_dir = Path(cfg.output_dir) / cfg.name
    out_dir.mkdir(parents=True, exist_ok=True)

    tiles = _load_tiles(cfg)
    # cfg.num_images caps file-loaded tile sets too (simulated sets are
    # already generated at that size)
    tiles = {
        k: v[: cfg.num_images] if getattr(v, "ndim", 0) >= 1 else v
        for k, v in tiles.items()
    }
    images = jnp.asarray(tiles["images"], dtype=jnp.float32)
    num_images = images.shape[0]
    num_batches = -(-num_images // cfg.batch_size)

    prior = build_prior(cfg.prior)
    model = build_image_model(cfg.image_model)
    kernel = build_kernel(cfg.kernel)

    backgrounds = None
    if cfg.use_tile_backgrounds:
        if "background" not in tiles:
            raise ValueError(
                "use_tile_backgrounds=True but the tiles artifact has no "
                "'background' maps — run the experiment's prepare step"
            )
        backgrounds = jnp.asarray(tiles["background"], dtype=jnp.float32)

    if method == "smc":
        smc_cfg = SMCConfig(
            num_catalogs=cfg.sampler.num_catalogs,
            ess_threshold_prop=cfg.sampler.ess_threshold_prop,
            resample_method=cfg.sampler.resample_method,
            max_smc_iters=cfg.sampler.max_smc_iters,
            flux_detection_threshold=cfg.sampler.flux_detection_threshold,
            relocate_sweeps=cfg.sampler.relocate_sweeps,
            pair_sweeps=cfg.sampler.pair_sweeps,
            dispatch_iters=cfg.sampler.dispatch_iters,
        )
        if cfg.aggregation.enabled:
            run = _make_smc_aggregate_runner(
                cfg, prior, model, kernel, smc_cfg
            )
        elif cfg.sampler.streaming:
            from smcdet_tpu.inference.streaming import run_csmc_streaming

            if backgrounds is not None:
                raise ValueError(
                    "per-tile backgrounds require the per-image pipeline "
                    "(aggregation.enabled: true)"
                )
            run = lambda key, imgs, bkgs=None: run_csmc_streaming(  # noqa: E731
                key, imgs, prior, model, kernel, smc_cfg,
                pool=cfg.sampler.streaming_pool or None,
            )
        else:
            from smcdet_tpu.inference.smc import run_csmc_chunked

            if backgrounds is not None:
                raise ValueError(
                    "per-tile backgrounds require the per-image pipeline "
                    "(aggregation.enabled: true)"
                )
            # memory-aware: a batch whose rate caches exceed the device
            # budget is processed in sequential tile chunks (exact — tiles
            # are independent)
            jitted = jax.jit(run_csmc)
            run = lambda key, imgs, bkgs=None: run_csmc_chunked(  # noqa: E731
                key, imgs, prior, model, kernel, smc_cfg, run=jitted,
                sort_tiles=cfg.sampler.sort_tiles,
            )
    elif method == "mcmc":
        from smcdet_tpu.inference.mcmc import MCMCConfig, run_mh

        mc_cfg = MCMCConfig(
            num_samples_total=cfg.mcmc.num_samples_total,
            num_samples_burnin=cfg.mcmc.num_samples_burnin,
            keep_every_k=cfg.mcmc.keep_every_k,
            flux_detection_threshold=cfg.sampler.flux_detection_threshold,
        )
        from smcdet_tpu.inference.kernels import SingleComponentMH

        if isinstance(kernel, SingleComponentMH):
            mh_kernel = kernel.replace(
                num_iters=1,
                locs_stdev=jnp.float32(cfg.mcmc.locs_stdev),
                fluxes_stdev=jnp.float32(cfg.mcmc.fluxes_stdev),
            )
        else:  # MALA step fields have different names
            mh_kernel = kernel.replace(
                num_iters=1,
                locs_step=jnp.float32(cfg.mcmc.locs_stdev),
                fluxes_step=jnp.float32(cfg.mcmc.fluxes_stdev),
            )

        @jax.jit
        def run(key, imgs, bkgs=None):
            # per-tile backgrounds ride as [T, 1, h, w] so they broadcast
            # against the per-chain particle axis
            m = model if bkgs is None else model.replace(
                background=bkgs[:, None]
            )
            return run_mh(key, imgs, prior, m, mh_kernel, mc_cfg)
    else:
        raise ValueError(f"unknown method {method!r}")

    manifest = {"config": cfg.name, "method": method, "batches": []}
    for b in range(num_batches):
        if b % num_jobs != job_index:
            continue
        path = out_dir / f"{method}_batch{b:04d}.npz"
        if path.exists():
            if verbose:
                print(f"batch {b}: exists, skipping (resume)")
            continue
        lo, hi = b * cfg.batch_size, min((b + 1) * cfg.batch_size, num_images)
        key = jax.random.fold_in(jax.random.key(cfg.seed), b)

        # pad a ragged final batch up to batch_size (duplicating the last
        # image) and slice the results back: a smaller last batch would
        # trigger a fresh XLA compile of the whole batched program —
        # ~20 min over a TPU tunnel vs seconds of duplicate compute
        n_real = hi - lo
        imgs_b = images[lo:hi]
        bkgs_b = None if backgrounds is None else backgrounds[lo:hi]
        if n_real < cfg.batch_size:
            pad = cfg.batch_size - n_real
            imgs_b = jnp.concatenate(
                [imgs_b, jnp.broadcast_to(imgs_b[-1:], (pad,) + imgs_b.shape[1:])]
            )
            if bkgs_b is not None:
                bkgs_b = jnp.concatenate(
                    [bkgs_b,
                     jnp.broadcast_to(bkgs_b[-1:], (pad,) + bkgs_b.shape[1:])]
                )

        start = time.perf_counter()
        result = run(key, imgs_b, bkgs_b)
        jax.block_until_ready(result)
        runtime = time.perf_counter() - start

        arrays = {
            f: (
                np.asarray(getattr(result, f))[:n_real]
                if getattr(getattr(result, f), "ndim", 0) >= 1
                and getattr(result, f).shape[0] == cfg.batch_size
                else np.asarray(getattr(result, f))
            )
            for f in result._fields
            if getattr(result, f) is not None
        }
        arrays["runtime"] = np.asarray(runtime)
        arrays["image_index"] = np.arange(lo, hi)
        np.savez_compressed(path, **arrays)
        manifest["batches"].append(
            {"batch": b, "images": [lo, hi], "runtime_s": runtime}
        )
        if verbose:
            print(f"batch {b}: images [{lo}, {hi}) in {runtime:.2f}s")

    with open(out_dir / f"{method}_manifest_job{job_index}.json", "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


def load_results(out_dir, method: str = "smc"):
    """Concatenate all batch artifacts of ``method`` under ``out_dir``."""
    paths = sorted(Path(out_dir).glob(f"{method}_batch*.npz"))
    if not paths:
        raise FileNotFoundError(f"no {method} batches under {out_dir}")
    batches = [np.load(p) for p in paths]
    keys = [k for k in batches[0].files if k != "runtime"]
    out = {}
    for k in keys:
        vals = [b[k] for b in batches]
        # per-batch scalars (e.g. num_iters) stack; per-image arrays concat
        out[k] = (
            np.stack(vals)
            if vals[0].ndim == 0
            else np.concatenate(vals, axis=0)
        )
    out["runtime"] = np.asarray([float(b["runtime"]) for b in batches])
    return out
