"""Tests for the dependency-light ingestion layer (FITS + WCS)."""

import bz2
import gzip

import numpy as np
import pytest

from smcdet_tpu.ingest import fits
from smcdet_tpu.ingest.wcs import TanWCS, plocs_from_ra_dec


def _pad_block(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 2880)


def _card(text: str) -> bytes:
    return text.ljust(80).encode("ascii")


class TestFITSImages:
    def test_write_read_roundtrip_float32(self, tmp_path):
        arr = np.random.default_rng(0).normal(size=(7, 11)).astype(np.float32)
        path = tmp_path / "img.fits"
        fits.write_image(path, arr, {"MYKEY": 42, "SCALE": 1.5})
        hdus = fits.read(path)
        assert len(hdus) == 1
        np.testing.assert_array_equal(hdus[0].data, arr)
        assert hdus[0].header["MYKEY"] == 42
        assert hdus[0].header["SCALE"] == pytest.approx(1.5)

    def test_roundtrip_int16_and_3d(self, tmp_path):
        arr = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
        path = tmp_path / "i.fits"
        fits.write_image(path, arr)
        out = fits.getdata(path)
        np.testing.assert_array_equal(out, arr)

    def test_bscale_bzero_unsigned(self, tmp_path):
        # Unsigned 16-bit stored as signed with BZERO=32768 (SDSS idiom).
        raw = np.asarray([[0, 1], [-32768, 32767]], dtype=np.int16)
        header = (
            _card("SIMPLE  =                    T")
            + _card("BITPIX  =                   16")
            + _card("NAXIS   =                    2")
            + _card("NAXIS1  =                    2")
            + _card("NAXIS2  =                    2")
            + _card("BZERO   =                32768")
            + _card("BSCALE  =                    1")
            + _card("END")
        )
        buf = _pad_block(header) + _pad_block(
            raw.astype(">i2").tobytes()
        )
        out = fits.read(buf)[0].data
        np.testing.assert_array_equal(
            out, np.asarray([[32768, 32769], [0, 65535]])
        )

    def test_gzip_and_bz2_transparent(self, tmp_path):
        arr = np.ones((3, 3), dtype=np.float32)
        path = tmp_path / "img.fits"
        fits.write_image(path, arr)
        raw = path.read_bytes()
        np.testing.assert_array_equal(fits.read(gzip.compress(raw))[0].data, arr)
        np.testing.assert_array_equal(fits.read(bz2.compress(raw))[0].data, arr)


class TestFITSBintable:
    def _table_bytes(self):
        # two columns: FIELD (1J), GAIN (5E); 2 rows
        nrows, rowbytes = 2, 4 + 20
        header = (
            _card("XTENSION= 'BINTABLE'")
            + _card("BITPIX  =                    8")
            + _card("NAXIS   =                    2")
            + _card(f"NAXIS1  =                   {rowbytes}")
            + _card(f"NAXIS2  =                    {nrows}")
            + _card("PCOUNT  =                    0")
            + _card("GCOUNT  =                    1")
            + _card("TFIELDS =                    2")
            + _card("TTYPE1  = 'FIELD   '")
            + _card("TFORM1  = '1J      '")
            + _card("TTYPE2  = 'GAIN    '")
            + _card("TFORM2  = '5E      '")
            + _card("END")
        )
        rows = b""
        for field, gains in [(12, [1.0, 2.0, 3.0, 4.0, 5.0]),
                             (13, [1.5, 2.5, 3.5, 4.5, 5.5])]:
            rows += np.asarray([field], dtype=">i4").tobytes()
            rows += np.asarray(gains, dtype=">f4").tobytes()
        # needs a primary HDU in front
        primary = (
            _card("SIMPLE  =                    T")
            + _card("BITPIX  =                    8")
            + _card("NAXIS   =                    0")
            + _card("END")
        )
        return _pad_block(primary) + _pad_block(header) + _pad_block(rows)

    def test_parse_columns(self):
        hdus = fits.read(self._table_bytes())
        assert len(hdus) == 2
        table = hdus[1].data
        np.testing.assert_array_equal(table["FIELD"], [12, 13])
        assert table["GAIN"].shape == (2, 5)
        np.testing.assert_allclose(table["GAIN"][1], [1.5, 2.5, 3.5, 4.5, 5.5])
        # case-insensitive access (SDSS mixes cases)
        np.testing.assert_array_equal(table["field"], [12, 13])


SDSS_LIKE_HEADER = {
    "CTYPE1": "RA---TAN",
    "CTYPE2": "DEC--TAN",
    "CRPIX1": 1025.0,
    "CRPIX2": 745.0,
    "CRVAL1": 298.0,
    "CRVAL2": 18.77,
    "CD1_1": -6.0e-6,
    "CD1_2": 1.09e-4,
    "CD2_1": 1.09e-4,
    "CD2_2": 6.0e-6,
}


class TestTanWCS:
    def test_crpix_maps_to_crval(self):
        wcs = TanWCS.from_header(SDSS_LIKE_HEADER)
        ra, dec = wcs.pix2world(1024.0, 744.0)
        np.testing.assert_allclose([ra, dec], [298.0, 18.77], atol=1e-10)

    def test_roundtrip(self):
        wcs = TanWCS.from_header(SDSS_LIKE_HEADER)
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 2048, 100)
        y = rng.uniform(0, 1489, 100)
        ra, dec = wcs.pix2world(x, y)
        x2, y2 = wcs.world2pix(ra, dec)
        np.testing.assert_allclose(x2, x, atol=1e-6)
        np.testing.assert_allclose(y2, y, atol=1e-6)

    def test_local_linearity_matches_cd(self):
        # One pixel step in x changes intermediate coords by ~CD column.
        wcs = TanWCS.from_header(SDSS_LIKE_HEADER)
        ra0, dec0 = wcs.pix2world(1024.0, 744.0)
        ra1, dec1 = wcs.pix2world(1025.0, 744.0)
        ddec = dec1 - dec0
        dra = (ra1 - ra0 + 180) % 360 - 180
        # dx=1 moves intermediate coords by the first CD column:
        # (d xi, d eta) = (CD1_1, CD2_1).
        np.testing.assert_allclose(
            dra * np.cos(np.deg2rad(dec0)), -6.0e-6, rtol=1e-3, atol=1e-9
        )
        np.testing.assert_allclose(ddec, 1.09e-4, rtol=1e-3)

    def test_swapped_axes(self):
        header = dict(SDSS_LIKE_HEADER)
        header["CTYPE1"], header["CTYPE2"] = "DEC--TAN", "RA---TAN"
        header["CRVAL1"], header["CRVAL2"] = 18.77, 298.0
        wcs = TanWCS.from_header(header)
        ra, dec = wcs.pix2world(1024.0, 744.0)
        np.testing.assert_allclose([ra, dec], [298.0, 18.77], atol=1e-10)

    def test_plocs_convention(self):
        wcs = TanWCS.from_header(SDSS_LIKE_HEADER)
        ra, dec = wcs.pix2world(100.0, 200.0)
        plocs = plocs_from_ra_dec([ra], [dec], wcs)
        # (row, col) + 0.5
        np.testing.assert_allclose(plocs[0], [200.5, 100.5], atol=1e-6)
