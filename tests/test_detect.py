"""Tests for the JAX-native source-extractor baseline (detect/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcdet_tpu.detect import estimate_background, extract, extract_batch
from smcdet_tpu.models.imaging import ImageModel
from smcdet_tpu.models.psf import GaussianPSF


def render(locs, fluxes, H=32, W=32, background=0.0):
    model = ImageModel(
        height=H,
        width=W,
        psf_radius=6,
        noise="poisson",
        background=jnp.float32(background),
        psf=GaussianPSF(stdev=jnp.float32(1.2)),
    )
    return model.render(jnp.asarray(locs), jnp.asarray(fluxes))


class TestExtract:
    def test_single_bright_star(self):
        img = render([[10.0, 20.0]], [1000.0])
        count, locs, fluxes = extract(img, thresh=5.0, err=1.0)
        assert int(count) == 1
        np.testing.assert_allclose(
            np.asarray(locs[0]), [10.0, 20.0], atol=0.3
        )
        # recovers nearly all the rendered flux (the reference-parity
        # Gaussian PSF integrates to ~sigma*sqrt(2 pi), not 1)
        total = float(np.asarray(img).sum())
        assert 0.9 * total < float(fluxes[0]) <= total + 1.0

    def test_two_separated_stars_sorted_by_flux(self):
        img = render([[8.0, 8.0], [24.0, 24.0]], [500.0, 900.0])
        count, locs, fluxes = extract(img, thresh=5.0, err=1.0)
        assert int(count) == 2
        assert float(fluxes[0]) > float(fluxes[1])
        np.testing.assert_allclose(np.asarray(locs[0]), [24.0, 24.0], atol=0.3)

    def test_empty_image(self):
        count, locs, fluxes = extract(jnp.zeros((32, 32)), thresh=3.0, err=1.0)
        assert int(count) == 0
        assert float(fluxes.sum()) == 0.0

    def test_minarea_kills_single_pixel_noise(self):
        img = jnp.zeros((32, 32)).at[5, 5].set(100.0)
        count, _, _ = extract(img, thresh=3.0, err=1.0, minarea=3)
        assert int(count) == 0
        count2, _, _ = extract(img, thresh=3.0, err=1.0, minarea=1)
        assert int(count2) == 1

    def test_deblending_splits_close_pair(self):
        # two peaks 5 px apart: one blended component, two basins
        img = render([[16.0, 13.0], [16.0, 18.0]], [800.0, 700.0])
        count, locs, _ = extract(
            img, thresh=2.0, err=1.0, deblend_cont=0.005
        )
        assert int(count) == 2
        cols = np.sort(np.asarray(locs[:2])[:, 1])
        np.testing.assert_allclose(cols, [13.0, 18.0], atol=0.3)
        # deblend_cont = 1.0 forbids splitting -> single source
        count2, _, _ = extract(img, thresh=2.0, err=1.0, deblend_cont=1.0)
        assert int(count2) == 1

    def test_batch(self):
        imgs = jnp.stack(
            [
                render([[10.0, 10.0]], [1000.0]),
                render([[20.0, 22.0]], [1500.0]),
            ]
        )
        counts, locs, fluxes = extract_batch(imgs, thresh=5.0, err=1.0)
        assert counts.shape == (2,)
        assert int(counts[0]) == 1 and int(counts[1]) == 1
        np.testing.assert_allclose(np.asarray(locs[1, 0]), [20.0, 22.0], atol=0.3)


class TestBackground:
    def test_flat_background_with_stars(self):
        key = jax.random.key(0)
        img = 150.0 + 3.0 * jax.random.normal(key, (64, 64))
        img = img + render([[30.0, 30.0]], [5000.0], H=64, W=64)
        bkg, rms = estimate_background(img, box_size=16)
        # sigma clipping rejects the star; background ~150 everywhere
        np.testing.assert_allclose(np.asarray(bkg), 150.0, atol=2.5)
        assert 1.5 < float(rms.mean()) < 4.5

    def test_gradient_background(self):
        yy = jnp.arange(64)[:, None] * jnp.ones((1, 64))
        img = 100.0 + yy * 0.5
        bkg, _ = estimate_background(img, box_size=16)
        np.testing.assert_allclose(
            np.asarray(bkg[24:40, :]), np.asarray(img[24:40, :]), rtol=0.05
        )
