"""End-to-end ingestion tests against a synthetic on-disk SDSS survey.

Builds photoField / frame / psField / photoObj files with the FITS writer,
then exercises SloanDigitalSkySurvey, read_frame, read_psf_params,
PhotoFullCatalog, SurveyPredictIterator, alignment, and the catalog
containers — entirely offline.
"""

import numpy as np
import pytest

from smcdet_tpu.ingest import fits
from smcdet_tpu.ingest.align import align
from smcdet_tpu.ingest.catalogs import FullCatalog, SourceType, TileCatalog
from smcdet_tpu.ingest.psf import ImagePSF, render_psf_image
from smcdet_tpu.ingest.sdss import (
    BANDS,
    PhotoFullCatalog,
    SloanDigitalSkySurvey,
    read_frame,
    read_psf_params,
)
from smcdet_tpu.ingest.survey import SurveyPredictIterator
from smcdet_tpu.ingest.wcs import TanWCS

RUN, CAMCOL, FIELD = 6895, 3, 52
H, W = 48, 64
GAINS = np.asarray([1.6, 3.3, 4.7, 5.2, 4.7], dtype=np.float32)

WCS_CARDS = {
    "CTYPE1": "RA---TAN",
    "CTYPE2": "DEC--TAN",
    "CRPIX1": 32.0,
    "CRPIX2": 24.0,
    "CRVAL1": 298.0,
    "CRVAL2": 18.77,
    "CD1_1": -6.0e-6,
    "CD1_2": 1.09e-4,
    "CD2_1": 1.09e-4,
    "CD2_2": 6.0e-6,
}


def make_survey_dir(tmp_path):
    base = tmp_path / "sdss"
    d2 = base / str(RUN) / str(CAMCOL)
    d3 = d2 / str(FIELD)
    d3.mkdir(parents=True)

    # photoField: FIELD + per-band GAIN
    fits.write_hdus(
        d2 / f"photoField-{RUN:06d}-{CAMCOL}.fits",
        [
            fits.image_hdu_bytes(primary=True),
            fits.bintable_hdu_bytes(
                {
                    "FIELD": np.asarray([FIELD - 1, FIELD], dtype=np.int32),
                    "GAIN": np.stack([GAINS * 0.9, GAINS]),
                }
            ),
        ],
    )

    # frames: HDU0 image (sky-subtracted nmgy) + WCS, HDU1 calibration,
    # HDU2 sky bintable
    rng = np.random.default_rng(0)
    for b, band in enumerate(BANDS):
        image_nmgy = rng.normal(0.0, 0.3, (H, W)).astype(np.float32)
        calib = np.full(W, 0.005 + 0.001 * b, dtype=np.float32)
        sky_small = np.full((3, 4), 100.0 + 10 * b, dtype=np.float32)
        fits.write_hdus(
            d3 / f"frame-{band}-{RUN:06d}-{CAMCOL}-{FIELD:04d}.fits",
            [
                fits.image_hdu_bytes(
                    image_nmgy, WCS_CARDS, primary=True
                ),
                fits.image_hdu_bytes(calib),
                fits.bintable_hdu_bytes(
                    {
                        "ALLSKY": sky_small[None],  # one row, [3, 4]
                        "XINTERP": np.linspace(0, 3, W, dtype=np.float32)[None],
                        "YINTERP": np.linspace(0, 2, H, dtype=np.float32)[None],
                    }
                ),
            ],
        )

    # psField: HDU 6 carries the 6 params per band
    sigma_fields = {
        "psf_sigma1": np.asarray([[1.1, 1.2, 1.3, 1.4, 1.5]], dtype=np.float32),
        "psf_sigma2": np.asarray([[2.1, 2.2, 2.3, 2.4, 2.5]], dtype=np.float32),
        "psf_sigmap": np.asarray([[1.7, 1.8, 1.9, 2.0, 2.1]], dtype=np.float32),
        "psf_beta": np.asarray([[3.0, 3.1, 3.2, 3.3, 3.4]], dtype=np.float32),
        "psf_b": np.asarray([[0.06, 0.07, 0.08, 0.09, 0.1]], dtype=np.float32),
        "psf_p0": np.asarray([[0.002, 0.003, 0.004, 0.005, 0.006]],
                             dtype=np.float32),
    }
    filler = fits.image_hdu_bytes()
    fits.write_hdus(
        d3 / f"psField-{RUN:06d}-{CAMCOL}-{FIELD:04d}.fits",
        [fits.image_hdu_bytes(primary=True)]
        + [filler] * 5
        + [fits.bintable_hdu_bytes(sigma_fields)],
    )

    # photoObj: two stars + one galaxy + one junk row
    wcs = TanWCS.from_header(WCS_CARDS)
    star_pix = np.asarray([[10.0, 20.0], [40.0, 30.0]])  # (x, y)
    ra_s, dec_s = wcs.pix2world(star_pix[:, 0], star_pix[:, 1])
    ra_g, dec_g = wcs.pix2world(50.0, 12.0)
    fits.write_hdus(
        d3 / f"photoObj-{RUN:06d}-{CAMCOL}-{FIELD:04d}.fits",
        [
            fits.image_hdu_bytes(primary=True),
            fits.bintable_hdu_bytes(
                {
                    "objc_type": np.asarray([6, 6, 3, 6], dtype=np.int32),
                    "thing_id": np.asarray([1, 2, 3, -1], dtype=np.int32),
                    "ra": np.asarray([ra_s[0], ra_s[1], ra_g, 10.0]),
                    "dec": np.asarray([dec_s[0], dec_s[1], dec_g, 1.0]),
                    "psfflux": np.tile(
                        np.asarray([[5.0], [7.0], [0.0], [1.0]],
                                   dtype=np.float32), (1, 5)
                    ),
                    "cmodelflux": np.tile(
                        np.asarray([[0.0], [0.0], [9.0], [0.0]],
                                   dtype=np.float32), (1, 5)
                    ),
                }
            ),
        ],
    )
    return base


@pytest.fixture(scope="module")
def survey(tmp_path_factory):
    base = make_survey_dir(tmp_path_factory.mktemp("sdss_data"))
    s = SloanDigitalSkySurvey(
        fields=[{"run": RUN, "camcol": CAMCOL, "fields": [FIELD]}],
        dir_path=str(base),
        load_image_data=True,
    )
    s.prepare_data(download=False)
    return s


class TestSurvey:
    def test_gain_resolution(self, survey):
        assert len(survey) == 1
        run, camcol, field, gain = survey.rcfgcs[0]
        np.testing.assert_allclose(gain, GAINS)

    def test_frame_reading(self, survey):
        item = survey[0]
        assert item["image"].shape == (5, H, W)
        assert item["background"].shape == (5, H, W)
        # sky for band b is flat at (100 + 10b) counts * gain electrons
        for b in range(5):
            np.testing.assert_allclose(
                item["background"][b], (100.0 + 10 * b) * GAINS[b], rtol=1e-6
            )
        # flux calibration = gain / calib, per column
        np.testing.assert_allclose(
            item["flux_calibration"][2],
            GAINS[2] / (0.005 + 0.001 * 2),
            rtol=1e-6,
        )

    def test_psf_params_squared_sigmas(self, survey):
        params = survey[0]["psf_params"]
        assert params.shape == (5, 6)
        np.testing.assert_allclose(params[2, 0], 1.3**2, rtol=1e-6)
        np.testing.assert_allclose(params[2, 3], 3.2, rtol=1e-6)

    def test_predict_iterator(self, survey):
        it = SurveyPredictIterator(survey)
        out = it[0]
        imgs = out["images"]
        # crop to multiple of 16
        assert imgs.shape == (5, 48, 64)
        # image was (sky-subtracted nmgy * nelec/nmgy + sky); the iterator
        # subtracts sky and divides calibration back out -> original nmgy
        item = survey[0]
        raw_path = survey.downloader.frame_path(RUN, CAMCOL, FIELD, "r")
        orig = fits.getdata(raw_path, 0)
        np.testing.assert_allclose(imgs[2], orig, rtol=1e-4, atol=1e-5)


class TestPhotoCatalog:
    def test_from_file(self, survey):
        path = survey.downloader.catalog_path(RUN, CAMCOL, FIELD)
        wcs = survey[0]["wcs"][2]
        cat = PhotoFullCatalog.from_file(path, wcs, H, W)
        # junk row (thing_id == -1) dropped
        assert cat["n_sources"][0] == 3
        assert (cat.star_bools.sum(), cat.galaxy_bools.sum()) == (2, 1)
        # star 0 was planted at pixel (x=10, y=20) -> plocs (20.5, 10.5)
        np.testing.assert_allclose(
            cat["plocs"][0, 0], [20.5, 10.5], atol=1e-3
        )
        # star fluxes from psfflux, galaxy from cmodelflux
        np.testing.assert_allclose(cat["fluxes"][0, 0, 2], 5.0)
        np.testing.assert_allclose(cat["fluxes"][0, 2, 2], 9.0)


class TestAlign:
    def test_identity_alignment_preserves_interior(self):
        wcs = TanWCS.from_header(WCS_CARDS)
        rng = np.random.default_rng(1)
        img = rng.normal(size=(2, 32, 40))
        out = align(img, [wcs, wcs], ref_band=0)
        np.testing.assert_allclose(
            out[:, 4:-4, 4:-4], img[:, 4:-4, 4:-4], atol=1e-4
        )

    def test_integer_shift_alignment(self):
        wcs0 = TanWCS.from_header(WCS_CARDS)
        shifted = dict(WCS_CARDS)
        shifted["CRPIX1"] = WCS_CARDS["CRPIX1"] + 3  # shifted by 3 px in x
        wcs1 = TanWCS.from_header(shifted)
        rng = np.random.default_rng(2)
        base = rng.normal(size=(32, 40))
        img1 = np.roll(base, 3, axis=1)  # what the shifted frame records
        out = align(np.stack([base, img1]), [wcs0, wcs1], ref_band=0)
        # the 3-px shift shrinks the joint footprint on the right edge, so
        # compare an interior margin wider than shift + kernel support
        np.testing.assert_allclose(
            out[1, 4:-4, 8:-8], base[4:-4, 8:-8], atol=1e-3
        )


class TestPSFSynth:
    def test_rendered_psf_normalised_peaked(self):
        params = (1.3**2, 2.3**2, 1.9**2, 3.2, 0.08, 0.004)
        img = render_psf_image(params, 25)
        assert img.shape == (25, 25)
        np.testing.assert_allclose(img.sum(), 1.0, rtol=1e-5)
        assert img.argmax() == 12 * 25 + 12

    def test_image_psf_continuous_matches_stamp(self):
        params = np.tile(
            np.asarray([1.3**2, 2.3**2, 1.9**2, 3.2, 0.08, 0.004]), (5, 1)
        )
        psf = ImagePSF(params, psf_slen=25)
        stamp = psf.image(2)
        # continuous evaluation at grid offsets reproduces the stamp
        dy, dx = np.mgrid[-12:13, -12:13]
        cont = psf.at(2, dy, dx)
        np.testing.assert_allclose(cont, stamp, rtol=1e-4, atol=1e-8)


class TestCatalogContainers:
    def _full(self):
        plocs = np.asarray(
            [[[5.0, 6.0], [17.0, 3.0], [26.0, 29.0], [0.0, 0.0]]]
        )
        d = {
            "plocs": plocs,
            "n_sources": np.asarray([3]),
            "source_type": np.zeros((1, 4, 1), dtype=np.int64),
            "fluxes": np.asarray(
                [[[10.0] * 5, [20.0] * 5, [5.0] * 5, [0.0] * 5]]
            ),
        }
        return FullCatalog(32, 32, d)

    def test_full_to_tile_roundtrip(self):
        full = self._full()
        tile = full.to_tile_catalog(16, max_sources_per_tile=2)
        assert tile.data["n_sources"].sum() == 3
        # source 0 at (5, 6) -> tile (0, 0), local loc (5, 6)
        np.testing.assert_allclose(tile["locs"][0, 0, 0, 0], [5.0, 6.0])
        back = tile.to_full_catalog()
        assert back["n_sources"][0] == 3
        orig = set(map(tuple, full["plocs"][0, :3].tolist()))
        rec = set(map(tuple, back["plocs"][0, :3].tolist()))
        assert orig == rec

    def test_filter_by_flux(self):
        tile = self._full().to_tile_catalog(16, 2)
        filtered = tile.filter_by_flux(min_flux=9.0)
        assert filtered.data["n_sources"].sum() == 2

    def test_brightest_per_tile(self):
        tile = self._full().to_tile_catalog(16, 2)
        top = tile.get_brightest_sources_per_tile(top_k=1)
        assert top.data["n_sources"].max() == 1
        fl = top.on_fluxes()
        assert fl.max() == 20.0

    def test_filter_by_ploc_box(self):
        full = self._full()
        sub = full.filter_by_ploc_box([0.0, 0.0], 16.0)
        assert sub["n_sources"][0] == 1
        np.testing.assert_allclose(sub["plocs"][0, 0], [5.0, 6.0])
