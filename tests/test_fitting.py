"""Tests for hyperparameter fitting (fitting.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcdet_tpu.distributions import TruncatedPareto
from smcdet_tpu.fitting import (
    fit_image_model,
    fit_poisson_rate,
    fit_truncated_pareto_flux,
)
from smcdet_tpu.models.imaging import M71ImageModel

TRUE_PSF = (1.51, 4.85, 1.32, 3.0, 0.09, 0.002)


class TestFluxPrior:
    def test_recovers_alpha(self):
        d = TruncatedPareto(
            alpha=jnp.float32(0.25),
            lower=jnp.float32(0.3),
            upper=jnp.float32(1800.0),
        )
        x = np.asarray(d.sample(jax.random.key(0), (20000,)))
        alpha, lower, upper = fit_truncated_pareto_flux(x)
        assert abs(alpha - 0.25) < 0.05, alpha
        assert abs(lower - 0.3) < 0.05
        assert upper > 500.0


class TestPoissonRate:
    def test_rate(self):
        counts = np.random.default_rng(0).poisson(4.32, size=5000)
        rate = fit_poisson_rate(counts, area=144.0)
        np.testing.assert_allclose(rate, 4.32 / 144.0, rtol=0.05)


@pytest.mark.slow
class TestImageModelFit:
    def test_recovers_noise_and_calibration(self):
        true_model = M71ImageModel(
            image_height=32,
            image_width=32,
            background=860.0,
            adu_per_nmgy=850.0,
            psf_params=TRUE_PSF,
            psf_radius=8,
            noise_additive=1e-3,
            noise_multiplicative=1.9,
        )
        locs = jnp.asarray(
            [[6.0, 7.0], [15.0, 22.0], [25.0, 10.0], [20.0, 28.0]]
        )
        fluxes = jnp.asarray([30.0, 80.0, 50.0, 20.0])
        image = true_model.sample(jax.random.key(1), locs, fluxes)

        fit = fit_image_model(
            image,
            locs,
            fluxes,
            psf_params_init=tuple(1.3 * p for p in TRUE_PSF),
            background_init=860.0,
            adu_per_nmgy_init=700.0,
            noise_multiplicative_init=1.0,
            num_steps=150,
        )
        assert np.isfinite(fit.final_loss)
        assert abs(fit.adu_per_nmgy - 850.0) / 850.0 < 0.1, fit
        assert 1.2 < fit.noise_multiplicative < 2.8, fit

        fitted_model = M71ImageModel(
            image_height=32,
            image_width=32,
            background=fit.background,
            adu_per_nmgy=fit.adu_per_nmgy,
            psf_params=fit.psf_params,
            psf_radius=8,
            noise_additive=fit.noise_additive,
            noise_multiplicative=fit.noise_multiplicative,
        )
        ll_fit = float(fitted_model.loglikelihood(image, locs, fluxes))
        bad_model = M71ImageModel(
            image_height=32,
            image_width=32,
            background=860.0,
            adu_per_nmgy=700.0,
            psf_params=tuple(1.3 * p for p in TRUE_PSF),
            psf_radius=8,
            noise_additive=1e-3,
            noise_multiplicative=1.0,
        )
        ll_bad = float(bad_model.loglikelihood(image, locs, fluxes))
        assert ll_fit > ll_bad
