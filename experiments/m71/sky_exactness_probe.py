#!/usr/bin/env python
"""Measure the fixture's sky-reconstruction error (decomposition closure).

The calibration-decomposition table (docs/results/RESULTS.md) long listed
"frame-level sky structure" as a conjectured cause of the m71 coverage
residual. This probe settles it: the fixture *generates* the frame's sky
through the same nearest-grid ALLSKY interpolation the reader uses
(make_fixture.py writes sky_e = sky_small[rint-grid] * gain; the reader
reconstructs background identically, smcdet_tpu/ingest/sdss.py:189-217 —
both mirror the reference's RegularGridInterpolator(method="nearest"),
reference sdss.py:204-218). So the pipeline's per-tile background equals
the generating sky up to float32 round-trip error, which this script
measures directly: regenerate the deterministic generation-side r-band
sky and compare it pixelwise to the reader's reconstruction.

Writes docs/results/m71/sky_exactness.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
REPO = HERE.parents[1]
sys.path.insert(0, str(HERE))


def main():
    from make_fixture import FRAME_H, FRAME_W, GAINS, RBAND, SKY_COUNTS

    from smcdet_tpu.ingest.sdss import read_frame

    # generation-side sky (deterministic: make_fixture.py's exact formula)
    gy, gx = np.mgrid[0:6, 0:8]
    sky_small_r = (
        SKY_COUNTS * (1.0 + 0.05 * gy / 5.0 + 0.03 * np.sin(gx / 7.0 * np.pi))
    ).astype(np.float32)
    gain = float(GAINS[RBAND])
    yint = np.linspace(0, 5, FRAME_H, dtype=np.float32)
    xint = np.linspace(0, 7, FRAME_W, dtype=np.float32)
    iy = np.clip(np.rint(yint).astype(int), 0, 5)
    ix = np.clip(np.rint(xint).astype(int), 0, 7)
    gen_sky_e = sky_small_r[iy[:, None], ix[None, :]] * gain

    frame = (
        HERE / "data" / "sdss" / "6895" / "3" / "52"
        / "frame-r-006895-3-0052.fits"
    )
    item = read_frame(str(frame), gain)
    rd = np.asarray(item["background"])
    d = np.abs(rd - gen_sky_e)
    report = {
        "frame": frame.name,
        "sky_range_electrons": [
            float(gen_sky_e.min()), float(gen_sky_e.max())
        ],
        "max_abs_err_electrons": float(d.max()),
        "max_rel_err": float((d / np.abs(gen_sky_e)).max()),
        "conclusion": (
            "reader background == generating sky to float32 round-trip "
            "precision; frame-level sky structure contributes ~0 to the "
            "m71 coverage residual by construction"
        ),
    }
    out = REPO / "docs" / "results" / "m71" / "sky_exactness.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
