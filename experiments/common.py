"""Shared CLI plumbing for experiment drivers."""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

# make the in-repo package importable without installation
_REPO_ROOT = str(Path(__file__).resolve().parents[1])
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Persistent XLA compilation cache: the per-image SMC+aggregation pipeline
# compiles in tens of minutes over a TPU tunnel, and every driver process
# pays it again without this. Override the location (or disable with an
# empty value) via JAX_COMPILATION_CACHE_DIR.
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", str(Path(_REPO_ROOT) / ".jax_cache")
)
if _cache_dir:
    import jax

    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from smcdet_tpu.config import load_config

# NOTE: smcdet_tpu.runner is imported inside the CLI functions, not here:
# importing it initializes the XLA backend, after which
# jax.distributed.initialize() (the --distributed path) refuses to run.


def experiment_config(script_path, config_name: str = "config.yaml"):
    return load_config(Path(script_path).parent / config_name)


def run_cli(script_path, method: str):
    parser = argparse.ArgumentParser()
    parser.add_argument("--job-index", type=int, default=0)
    parser.add_argument("--num-jobs", type=int, default=1)
    parser.add_argument("--num-images", type=int, default=None)
    parser.add_argument(
        "--config",
        default="config.yaml",
        help="alternate config file in the experiment directory (e.g. "
        "config_mis.yaml for the misspecified-PSF M71 variant)",
    )
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="bootstrap the multi-host process group from the standard "
        "env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
        "JAX_PROCESS_ID); each process then runs its own image shard",
    )
    parser.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (the axon TPU plugin overrides the "
        "JAX_PLATFORMS env var, so an env var alone cannot)",
    )
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.distributed:
        # must precede the runner import (which initializes the backend)
        from smcdet_tpu.parallel.distributed import initialize_distributed

        initialize_distributed(require=True)

    from smcdet_tpu.runner import run_experiment

    cfg = experiment_config(script_path, args.config)
    if args.num_images is not None:
        cfg.num_images = args.num_images
    out = run_experiment(
        cfg,
        method=method,
        job_index=args.job_index,
        num_jobs=args.num_jobs,
    )
    print(f"results in {out}")


def generate_cli(script_path):
    import numpy as np

    parser = argparse.ArgumentParser()
    parser.add_argument("--num-images", type=int, default=None)
    args = parser.parse_args()

    cfg = experiment_config(script_path)
    if args.num_images is not None:
        cfg.num_images = args.num_images
    from smcdet_tpu.runner import simulate_tiles

    tiles = simulate_tiles(cfg)
    out_dir = Path(cfg.output_dir) / cfg.name
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / "tiles.npz"
    np.savez_compressed(path, **tiles)
    print(f"saved {tiles['images'].shape[0]} tiles to {path}")
