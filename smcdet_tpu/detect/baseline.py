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
    output). Even images tune, odd evaluate — the reference's checkerboard
    split pattern (run_sep.py:24-27)."""
    if key is None:
        key = jax.random.key(0)
    model = build_image_model(cfg.image_model)
    flux_scale = _psf_flux_scale(model)
    background = cfg.image_model.background
    err = float(np.sqrt(background))

    tune = {k: v[0::2][:num_tune] for k, v in tiles.items()}
    eval_ = {k: v[1::2] for k, v in tiles.items()}

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
        background=background,
        err=err,
        adu_per_nmgy=flux_scale,
        mag_bins=mag_bins,
        thresh_grid=thresh_grid,
        minarea_grid=minarea_grid,
        deblend_cont_grid=deblend_cont_grid,
        clean_param_grid=clean_param_grid,
    )

    counts, locs, fluxes = extract_batch(
        jnp.asarray(eval_["images"]) - background,
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
    }
    return score, best, results


def run_sep_cli(script_path, argv=None):
    """CLI entry shared by the per-experiment run_sep.py scripts."""
    import argparse

    from smcdet_tpu.config import load_config
    from smcdet_tpu.runner import simulate_tiles

    parser = argparse.ArgumentParser()
    parser.add_argument("--num-tune", type=int, default=50)
    parser.add_argument("--num-images", type=int, default=None)
    args = parser.parse_args(argv)

    cfg = load_config(Path(script_path).parent / "config.yaml")
    if args.num_images is not None:
        cfg.num_images = args.num_images
    out_dir = Path(cfg.output_dir) / cfg.name
    out_dir.mkdir(parents=True, exist_ok=True)

    tiles_path = out_dir / "tiles.npz"
    if tiles_path.exists():
        tiles = dict(np.load(tiles_path))
    else:
        tiles = simulate_tiles(cfg)

    score, best, results = run_sep_baseline(
        cfg, tiles, num_tune=args.num_tune
    )
    print(f"best F1 = {score:.3f} with {best}")
    np.savez_compressed(out_dir / "sep_results.npz", **results,
                        tuned_f1=np.asarray(score))
    print(f"saved {out_dir / 'sep_results.npz'}")
