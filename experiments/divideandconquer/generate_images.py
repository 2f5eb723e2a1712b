#!/usr/bin/env python
"""Simulate tiles from this experiment's generative model
(reference generate_images.py parity)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from common import generate_cli

if __name__ == "__main__":
    generate_cli(__file__)
