"""Statistical posterior-correctness tests on the basic config.

This is the automated version of the reference's notebook validation
(SURVEY.md §4): simulate images from the exact generative model, run
CS-SMC, and check (1) count confusion-matrix symmetry, (2) credible
-interval coverage of the total flux, (3) SBC rank uniformity. All
tolerances are Monte Carlo bounds for the small image/particle budget a
unit test can afford.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcdet_tpu.inference.kernels import SingleComponentMH
from smcdet_tpu.inference.smc import SMCConfig, run_csmc
from smcdet_tpu.models.imaging import ImageModel
from smcdet_tpu.models.priors import (
    NormalFlux,
    PointProcessPrior,
    UniformCounts,
)
from smcdet_tpu.models.psf import GaussianPSF
from smcdet_tpu.validation import (
    confusion_asymmetry,
    count_confusion_matrix,
    credible_interval_coverage,
    sbc_ranks,
    sbc_uniformity_pvalue,
)

NUM_IMAGES = 48
N_CATALOGS = 192


@pytest.fixture(scope="module")
def posterior():
    prior = PointProcessPrior(
        min_objects=0,
        max_objects=2,
        image_height=8,
        image_width=8,
        pad=0.0,  # no padding => every true star is in-bounds
        counts=UniformCounts(low=0, high=2),
        flux=NormalFlux(mean=jnp.float32(1500.0), stdev=jnp.float32(150.0)),
    )
    model = ImageModel(
        height=8,
        width=8,
        psf_radius=4,
        noise="poisson",
        background=jnp.float32(150.0),
        psf=GaussianPSF(stdev=jnp.float32(1.0)),
    )
    kernel = SingleComponentMH(
        num_iters=30,
        locs_stdev=jnp.float32(0.3),
        fluxes_stdev=jnp.float32(60.0),
        fluxes_min=jnp.float32(500.0),
        fluxes_max=jnp.float32(3000.0),
    )
    # draw (theta, x) from the joint: counts/locs/fluxes then images
    key = jax.random.key(11)
    k_prior, k_img, k_smc = jax.random.split(key, 3)
    counts, locs, fluxes = prior.sample(k_prior, NUM_IMAGES)
    images = model.sample(k_img, locs, fluxes)

    cfg = SMCConfig(
        num_catalogs=N_CATALOGS,
        resample_method="systematic",
        max_smc_iters=40,
        flux_detection_threshold=0.0,
    )
    result = jax.jit(run_csmc)(k_smc, images, prior, model, kernel, cfg)
    return {
        "true_counts": np.asarray(counts),
        "true_total_flux": np.asarray(fluxes.sum(-1)),
        "result": jax.block_until_ready(result),
    }


@pytest.mark.slow
class TestCalibration:
    def test_count_confusion_symmetry(self, posterior):
        r = posterior["result"]
        M = count_confusion_matrix(
            posterior["true_counts"],
            np.asarray(r.counts),
            weights=np.asarray(r.weights),
        )
        asym = confusion_asymmetry(M)
        # diagonal should dominate and asymmetry should be MC-small
        assert np.trace(M) > 0.5, M
        assert asym < 0.35, (asym, M)

    def test_total_flux_coverage(self, posterior):
        r = posterior["result"]
        samples = np.asarray(r.fluxes).sum(-1)  # [I, CN]
        cov = credible_interval_coverage(
            posterior["true_total_flux"],
            samples,
            levels=[0.5, 0.8, 0.95],
            weights=np.asarray(r.weights),
        )
        # binomial MC tolerance at 48 images: ~3 sigma
        for nominal, actual in zip([0.5, 0.8, 0.95], cov):
            sigma = np.sqrt(nominal * (1 - nominal) / NUM_IMAGES)
            assert abs(actual - nominal) < 4 * sigma + 0.02, (nominal, cov)

    def test_sbc_total_flux_uniform(self, posterior):
        r = posterior["result"]
        samples = np.asarray(r.fluxes).sum(-1)
        ranks = sbc_ranks(
            posterior["true_total_flux"],
            samples,
            weights=np.asarray(r.weights),
        )
        p = sbc_uniformity_pvalue(ranks)
        assert p > 0.005, (p, np.sort(ranks)[:10])

    def test_sbc_counts_uniform(self, posterior):
        r = posterior["result"]
        ranks = sbc_ranks(
            posterior["true_counts"],
            np.asarray(r.counts),
            weights=np.asarray(r.weights),
        )
        p = sbc_uniformity_pvalue(ranks)
        assert p > 0.005, p


@pytest.mark.slow
class TestM71Calibration:
    """Same checks on the Gaussian-noise M71 model family."""

    @pytest.fixture(scope="class")
    def posterior(self):
        from smcdet_tpu.models.imaging import M71ImageModel
        from smcdet_tpu.models.priors import M71Prior

        prior = M71Prior(
            min_objects=0,
            max_objects=2,
            counts_rate=0.015,
            image_height=8,
            image_width=8,
            flux_alpha=0.5,
            flux_lower=5.0,
            flux_upper=500.0,
            pad=0.0,
        )
        model = M71ImageModel(
            image_height=8,
            image_width=8,
            background=865.0,
            adu_per_nmgy=856.0,
            psf_params=(1.51, 4.85, 1.32, 3.0, 0.09, 0.002),
            psf_radius=8,
            noise_additive=0.001,
            noise_multiplicative=1.94,
        )
        kernel = SingleComponentMH(
            num_iters=30,
            locs_stdev=jnp.float32(0.3),
            fluxes_stdev=jnp.float32(3.0),
            fluxes_min=jnp.float32(5.0),
            fluxes_max=jnp.float32(500.0),
        )
        key = jax.random.key(21)
        k_prior, k_img, k_smc = jax.random.split(key, 3)
        counts, locs, fluxes = prior.sample(k_prior, NUM_IMAGES)
        images = model.sample(k_img, locs, fluxes)
        cfg = SMCConfig(
            num_catalogs=N_CATALOGS,
            resample_method="systematic",
            max_smc_iters=40,
            flux_detection_threshold=0.0,
        )
        result = jax.jit(run_csmc)(k_smc, images, prior, model, kernel, cfg)
        return {
            "true_counts": np.asarray(counts),
            "true_total_flux": np.asarray(fluxes.sum(-1)),
            "result": jax.block_until_ready(result),
        }

    def test_m71_count_confusion_symmetry(self, posterior):
        r = posterior["result"]
        M = count_confusion_matrix(
            posterior["true_counts"],
            np.asarray(r.counts),
            weights=np.asarray(r.weights),
        )
        assert np.trace(M) > 0.5, M
        assert confusion_asymmetry(M) < 0.35, M

    def test_m71_sbc_counts_uniform(self, posterior):
        r = posterior["result"]
        ranks = sbc_ranks(
            posterior["true_counts"],
            np.asarray(r.counts),
            weights=np.asarray(r.weights),
        )
        assert sbc_uniformity_pvalue(ranks) > 0.005

    def test_m71_total_flux_coverage(self, posterior):
        r = posterior["result"]
        samples = np.asarray(r.fluxes).sum(-1)
        cov = credible_interval_coverage(
            posterior["true_total_flux"],
            samples,
            levels=[0.8],
            weights=np.asarray(r.weights),
        )
        sigma = np.sqrt(0.8 * 0.2 / NUM_IMAGES)
        assert abs(cov[0] - 0.8) < 4 * sigma + 0.02, cov
