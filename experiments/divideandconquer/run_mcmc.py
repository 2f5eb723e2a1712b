#!/usr/bin/env python
"""Run the MH baseline over this experiment's tiles
(reference run_mcmc.py parity)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from common import run_cli

if __name__ == "__main__":
    run_cli(__file__, method="mcmc")
