#!/usr/bin/env python
"""CS-SMC over the M71 tiles with the *generating* (oracle) hyperparameters.

Attribution study for the fitted-pipeline coverage gap: the main m71 run
infers with hyperparameters fitted on the train half
(``params_path: data/m71/params.yaml``), which is the honest real-data
protocol but leaves the model mildly misspecified (the PSF power-law
tail and the flux upper truncation are weakly identified — see
``docs/results/RESULTS.md``). This driver runs the identical pipeline
with the fixture's generating hyperparameters (the literal values in
``config.yaml``, which ``params_path`` normally overrides), so the
difference in coverage/SBC between ``output/m71`` and
``output/m71oracle`` isolates what hyperparameter estimation costs —
the synthetic-fixture analogue of the reference's real-data
PSF-misspecification finding (manuscript.tex:686-688).

Usage: python run_smc_oracle.py [--num-images N]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from common import experiment_config  # noqa: E402  (sets up sys.path/cache)

from smcdet_tpu.runner import run_experiment  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-images", type=int, default=None)
    args = parser.parse_args()

    from smcdet_tpu.config import load_config

    # Load config.yaml WITHOUT the fitted-params overlay: the literal
    # prior/image_model values in config.yaml are the fixture's
    # generating hyperparameters (make_fixture.py).
    cfg = load_config(Path(__file__).parent / "config.yaml",
                      apply_params=False)
    cfg.name = "m71oracle"
    if args.num_images is not None:
        cfg.num_images = args.num_images
    out = run_experiment(cfg, method="smc")
    print(f"results in {out}")
