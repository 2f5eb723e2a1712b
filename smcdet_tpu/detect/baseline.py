"""Tuned source-extractor baseline over an experiment config.

Shared implementation of the reference's ``run_sep.py`` drivers
(/root/reference/experiments/{basic,m71}/run_sep.py): grid-search the
extractor hyperparameters by F1 on a tuning split, then run the tuned
extractor on the evaluation split and save detections in the framework's
flux units.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from smcdet_tpu.config import ExperimentConfig, build_image_model
from smcdet_tpu.detect.extractor import extract_batch, tune_extractor
from smcdet_tpu.utils.units import convert_nmgy_to_mag

__all__ = ["run_sep_baseline"]


def _psf_flux_scale(model) -> float:
    """Total image flux produced by one unit of intrinsic flux: the PSF
    integral times the calibration. Normalised survey PSFs give ~1x the
    calibration; the reference-parity Gaussian PSF integrates to
    ~stdev*sqrt(2 pi), and extractor fluxes must be divided by this to
    land in intrinsic (prior) units."""
    center = jnp.asarray(
        [model.height / 2.0, model.width / 2.0], dtype=jnp.float32
    )
    psf_total = float(model.star_image(center).sum())
    return psf_total * float(jnp.asarray(model.adu_per_nmgy))


def run_sep_baseline(
    cfg: ExperimentConfig,
    tiles: dict,
    num_tune: int = 50,
    thresh_grid=np.arange(1.0, 8.5, 1.5),
    minarea_grid=(1, 3, 5),
    deblend_cont_grid=(1e-6, 1e-3),
    clean_param_grid=(0.0, 1.0),
    key=None,
):
    """Tune + run the extractor; returns (best_f1, best_params, results).

    ``tiles`` must contain images and true_* arrays (runner.simulate_tiles
    output). The tune/eval split: the ``checkerboard`` column when present
    (True = train/tune half — the reference's real checkerboard split,
    m71.ipynb cells 20-25), otherwise even tiles tune / odd evaluate
    (run_sep.py:24-27). Per-tile ``background`` maps are used for the
    subtraction when present (real frame sky instead of the configured
    scalar)."""
    if key is None:
        key = jax.random.key(0)
    model = build_image_model(cfg.image_model)
    flux_scale = _psf_flux_scale(model)

    n = tiles["images"].shape[0]
    if "checkerboard" in tiles:
        cb = np.asarray(tiles["checkerboard"]).astype(bool)
        tune_idx = np.flatnonzero(cb)[:num_tune]
        eval_idx = np.flatnonzero(~cb)
    else:
        tune_idx = np.arange(0, n, 2)[:num_tune]
        eval_idx = np.arange(1, n, 2)
    arrays = {
        k: v for k, v in tiles.items() if getattr(v, "ndim", 0) >= 1
    }
    tune = {k: v[tune_idx] for k, v in arrays.items()}
    eval_ = {k: v[eval_idx] for k, v in arrays.items()}

    if "background" in tiles:
        bkg_tune = np.asarray(tune["background"])
        bkg_eval = np.asarray(eval_["background"])
        err = float(np.sqrt(bkg_tune.mean()))
    else:
        bkg_tune = bkg_eval = cfg.image_model.background
        err = float(np.sqrt(cfg.image_model.background))

    det_thresh_mag = float(
        convert_nmgy_to_mag(
            jnp.asarray(cfg.sampler.flux_detection_threshold)
        )
    )
    # single magnitude bin: everything brighter than the detection limit
    mag_bins = jnp.asarray([det_thresh_mag])

    score, best = tune_extractor(
        key,
        tune["images"],
        tune["true_counts"],
        tune["true_locs"],
        tune["true_fluxes"],
        background=jnp.asarray(bkg_tune, dtype=jnp.float32),
        err=err,
        adu_per_nmgy=flux_scale,
        mag_bins=mag_bins,
        thresh_grid=thresh_grid,
        minarea_grid=minarea_grid,
        deblend_cont_grid=deblend_cont_grid,
        clean_param_grid=clean_param_grid,
    )

    counts, locs, fluxes = extract_batch(
        jnp.asarray(eval_["images"])
        - jnp.asarray(bkg_eval, dtype=jnp.float32),
        thresh=best["thresh"],
        err=err,
        minarea=best["minarea"],
        deblend_cont=best["deblend_cont"],
        clean_param=best["clean_param"],
    )
    results = {
        "counts": np.asarray(counts),
        "locs": np.asarray(locs),
        "fluxes": np.asarray(fluxes) / flux_scale,
        "eval_true_counts": np.asarray(eval_["true_counts"]),
        "eval_true_locs": np.asarray(eval_["true_locs"]),
        "eval_true_fluxes": np.asarray(eval_["true_fluxes"]),
        # which tiles of the artifact the eval rows correspond to, so the
        # analysis can compare SMC and SEP on the identical subset
        "eval_indices": eval_idx,
    }
    return score, best, results


def run_sep_cli(script_path, argv=None):
    """CLI entry shared by the per-experiment run_sep.py scripts."""
    import argparse

    from smcdet_tpu.config import load_config
    from smcdet_tpu.runner import _load_tiles

    parser = argparse.ArgumentParser()
    parser.add_argument("--num-tune", type=int, default=50)
    parser.add_argument("--num-images", type=int, default=None)
    parser.add_argument(
        "--config",
        default="config.yaml",
        help="alternate config file in the experiment directory",
    )
    args = parser.parse_args(argv)

    cfg = load_config(Path(script_path).parent / args.config)
    if args.num_images is not None:
        cfg.num_images = args.num_images
    out_dir = Path(cfg.output_dir) / cfg.name
    out_dir.mkdir(parents=True, exist_ok=True)

    # same resolution order as the SMC/MCMC drivers: explicit data_path,
    # staged tiles.npz, else simulate
    tiles = _load_tiles(cfg)

    score, best, results = run_sep_baseline(
        cfg, tiles, num_tune=args.num_tune
    )
    print(f"best F1 = {score:.3f} with {best}")
    np.savez_compressed(out_dir / "sep_results.npz", **results,
                        tuned_f1=np.asarray(score))
    print(f"saved {out_dir / 'sep_results.npz'}")
