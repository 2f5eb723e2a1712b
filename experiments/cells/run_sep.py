#!/usr/bin/env python
"""Source-extractor baseline with F1 hyperparameter tuning
(reference run_sep.py parity; see smcdet_tpu.detect.baseline)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from smcdet_tpu.detect.baseline import run_sep_cli

if __name__ == "__main__":
    run_sep_cli(__file__)
