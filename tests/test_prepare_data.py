"""Offline dry-run of the full M71 data-prep pipeline.

Synthesizes a complete full-frame SDSS product set (photoField, 5-band
frames with WCS, psField) plus a Hubble-catalog text file — real archive
bytes cannot be vendored here (no network egress and no astropy on the
image), so the fixtures are spec-derived: the same HDU layouts, column
names, and dtypes the real products use
(/root/reference/experiments/m71/survey_utils/sdss.py:198-239, :453-485).
Then runs ``experiments/m71/prepare_data.py --no-download`` end-to-end
and checks the tiles + fitted-params artifacts.
"""

import runpy
import sys
from pathlib import Path

import numpy as np
import pytest

from smcdet_tpu.ingest import fits
from smcdet_tpu.ingest.wcs import TanWCS

pytestmark = pytest.mark.slow

RUN, CAMCOL, FIELD = 6895, 3, 52
FRAME_H, FRAME_W = 1489, 2048
BANDS = ("u", "g", "r", "i", "z")
GAINS = np.asarray([1.6, 3.3, 4.7, 5.2, 4.7], dtype=np.float32)
REGION_Y0, REGION_X0, REGION_H, REGION_W = 900, 1728, 320, 160

WCS_CARDS = {
    "CTYPE1": "RA---TAN",
    "CTYPE2": "DEC--TAN",
    "CRPIX1": 1024.0,
    "CRPIX2": 744.0,
    "CRVAL1": 298.0,
    "CRVAL2": 18.77,
    "CD1_1": -6.0e-6,
    "CD1_2": 1.09e-4,
    "CD2_1": 1.09e-4,
    "CD2_2": 6.0e-6,
}


def _gaussian_star(image, row, col, flux_nmgy, sigma=1.4, radius=6):
    r0, c0 = int(row), int(col)
    ys = np.arange(max(0, r0 - radius), min(image.shape[0], r0 + radius + 1))
    xs = np.arange(max(0, c0 - radius), min(image.shape[1], c0 + radius + 1))
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    pr = np.exp(
        -((yy + 0.5 - row) ** 2 + (xx + 0.5 - col) ** 2) / (2 * sigma**2)
    ) / (2 * np.pi * sigma**2)
    image[ys[0] : ys[-1] + 1, xs[0] : xs[-1] + 1] += flux_nmgy * pr


def build_data_dir(tmp_path):
    rng = np.random.default_rng(5)
    sdss = tmp_path / "sdss"
    d2 = sdss / str(RUN) / str(CAMCOL)
    d3 = d2 / str(FIELD)
    d3.mkdir(parents=True)

    fits.write_hdus(
        d2 / f"photoField-{RUN:06d}-{CAMCOL}.fits",
        [
            fits.image_hdu_bytes(primary=True),
            fits.bintable_hdu_bytes(
                {
                    "FIELD": np.asarray([FIELD], dtype=np.int32),
                    "GAIN": GAINS[None],
                }
            ),
        ],
    )

    # stars: most inside the target region, a handful in the fit patch
    n_region = 60
    rows = rng.uniform(REGION_Y0 + 1, REGION_Y0 + REGION_H - 1, n_region)
    cols = rng.uniform(REGION_X0 + 1, REGION_X0 + REGION_W - 1, n_region)
    # faint enough that no pixel crosses the 60000-electron saturation
    # threshold (peak e- ~ flux * 0.08 * gain/calib ~ flux * 76)
    mags = rng.uniform(16.8, 20.0, n_region)
    patch_rows = rng.uniform(REGION_Y0 - 94, REGION_Y0 - 40, 8)
    patch_cols = rng.uniform(REGION_X0 + 2, REGION_X0 + 62, 8)
    patch_mags = rng.uniform(16.8, 18.5, 8)
    all_rows = np.concatenate([rows, patch_rows])
    all_cols = np.concatenate([cols, patch_cols])
    all_mags = np.concatenate([mags, patch_mags])
    fluxes = 10 ** ((22.5 - all_mags) / 2.5)

    for b, band in enumerate(BANDS):
        img = rng.normal(0.0, 0.02, (FRAME_H, FRAME_W)).astype(np.float32)
        if band == "r":
            for r, c, f in zip(all_rows, all_cols, fluxes):
                _gaussian_star(img, r, c, f)
        calib = np.full(FRAME_W, 0.005, dtype=np.float32)
        sky_small = np.full((3, 4), 120.0, dtype=np.float32)
        fits.write_hdus(
            d3 / f"frame-{band}-{RUN:06d}-{CAMCOL}-{FIELD:04d}.fits",
            [
                fits.image_hdu_bytes(img, WCS_CARDS, primary=True),
                fits.image_hdu_bytes(calib),
                fits.bintable_hdu_bytes(
                    {
                        "ALLSKY": sky_small[None],
                        "XINTERP": np.linspace(
                            0, 3, FRAME_W, dtype=np.float32
                        )[None],
                        "YINTERP": np.linspace(
                            0, 2, FRAME_H, dtype=np.float32
                        )[None],
                    }
                ),
            ],
        )

    psf_fields = {
        "psf_sigma1": np.full((1, 5), 1.4, dtype=np.float32),
        "psf_sigma2": np.full((1, 5), 3.0, dtype=np.float32),
        "psf_sigmap": np.full((1, 5), 2.0, dtype=np.float32),
        "psf_beta": np.full((1, 5), 3.0, dtype=np.float32),
        "psf_b": np.full((1, 5), 0.06, dtype=np.float32),
        "psf_p0": np.full((1, 5), 0.002, dtype=np.float32),
    }
    filler = fits.image_hdu_bytes()
    fits.write_hdus(
        d3 / f"psField-{RUN:06d}-{CAMCOL}-{FIELD:04d}.fits",
        [fits.image_hdu_bytes(primary=True)]
        + [filler] * 5
        + [fits.bintable_hdu_bytes(psf_fields)],
    )

    # Hubble .zpt: 3 header lines, then >=23 whitespace columns with
    # col 9 = V mag, cols 21/22 = RA/DEC (prepare_data.py usecols).
    wcs = TanWCS.from_header(WCS_CARDS)
    # rows/cols are model-locs (pixel centres at +0.5); pix2world takes
    # FITS pixel indices and plocs_from_ra_dec re-adds the 0.5
    ra, dec = wcs.pix2world(all_cols - 0.5, all_rows - 0.5)
    table = np.zeros((all_rows.shape[0], 23))
    table[:, 9] = all_mags
    table[:, 21] = ra
    table[:, 22] = dec
    m71 = tmp_path / "m71"
    m71.mkdir()
    with open(m71 / "hubble_ngc6838.zpt", "w") as f:
        f.write("# synthetic header\n# line2\n# line3\n")
        np.savetxt(f, table, fmt="%.8f")
    return tmp_path


def test_prepare_data_offline_dry_run(tmp_path, monkeypatch, capsys):
    data_dir = build_data_dir(tmp_path)
    script = (
        Path(__file__).resolve().parents[1]
        / "experiments"
        / "m71"
        / "prepare_data.py"
    )
    monkeypatch.setattr(
        sys,
        "argv",
        [str(script), "--data-dir", str(data_dir), "--no-download"],
    )
    runpy.run_path(str(script), run_name="__main__")

    tiles = np.load(data_dir / "m71" / "tiles.npz")
    n_tiles = (REGION_H // 8) * (REGION_W // 8)
    assert tiles["images"].shape == (n_tiles, 8, 8)
    assert tiles["true_locs"].shape[0] == n_tiles
    # all 60 region stars land in some tile
    assert tiles["true_counts"].sum() == 60
    assert 0 < tiles["checkerboard"].sum() < n_tiles
    # tiles hold sky-included electrons: far above the nmgy scale
    assert tiles["images"].mean() > 100.0

    import yaml

    with open(data_dir / "m71" / "params.yaml") as f:
        params = yaml.safe_load(f)
    for k in (
        "flux_alpha",
        "flux_lower",
        "flux_upper",
        "counts_rate",
        "adu_per_nmgy",
        "psf_params",
        "noise_multiplicative",
    ):
        assert k in params, k
    assert params["flux_lower"] > 0
    assert params["flux_upper"] > params["flux_lower"]
    assert 0 < params["counts_rate"] < 1.0
    assert np.isfinite(params["adu_per_nmgy"])
    assert len(params["psf_params"]) == 6
