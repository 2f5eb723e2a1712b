#!/usr/bin/env python
"""Run the no-tiling gold-standard posterior over the same images
(config_singletile.yaml); compare with compare_singletile.py."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import common  # noqa: F401  (repo path + compilation cache)
from smcdet_tpu.config import load_config
from smcdet_tpu.runner import run_experiment

if __name__ == "__main__":
    cfg = load_config(Path(__file__).parent / "config_singletile.yaml")
    out = run_experiment(cfg, method="smc")
    print(f"results in {out}")
