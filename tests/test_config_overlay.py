"""Fitted-params overlay (config.apply_fitted_params / params_path) and
per-tile background-map support in the model/kernel cache path."""

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from smcdet_tpu.config import (
    ExperimentConfig,
    apply_fitted_params,
    build_image_model,
    build_prior,
    load_config,
    save_config,
)


PARAMS = {
    "flux_alpha": 0.21,
    "flux_lower": 0.3,
    "flux_upper": 1500.0,
    "counts_rate": 0.04,
    "pad": 4.0,
    "background": 900.0,
    "adu_per_nmgy": 850.0,
    "psf_params": [1.5, 4.8, 1.3, 3.1, 0.09, 0.003],
    "psf_radius": 8,
    "noise_additive": 0.5,
    "noise_multiplicative": 2.2,
}


def test_apply_fitted_params_overlays_all_sections():
    cfg = ExperimentConfig()
    apply_fitted_params(cfg, PARAMS)
    assert cfg.prior.flux_alpha == 0.21
    assert cfg.prior.flux_lower == 0.3
    assert cfg.prior.counts_rate == 0.04
    # kernel truncation bounds track the prior support
    assert cfg.kernel.fluxes_min == 0.3
    assert cfg.kernel.fluxes_max == 1500.0
    assert cfg.image_model.background == 900.0
    assert cfg.image_model.psf_params == tuple(PARAMS["psf_params"])
    assert cfg.image_model.noise_multiplicative == 2.2
    # the overlaid config still builds
    build_prior(cfg.prior)
    build_image_model(cfg.image_model)


def test_load_config_applies_params_path(tmp_path):
    cfg = ExperimentConfig(name="x", params_path="fitted.yaml")
    save_config(cfg, tmp_path / "config.yaml")
    with open(tmp_path / "fitted.yaml", "w") as f:
        yaml.safe_dump(PARAMS, f)
    loaded = load_config(tmp_path / "config.yaml")
    assert loaded.image_model.adu_per_nmgy == 850.0
    assert loaded.prior.flux_upper == 1500.0


def test_tile_background_map_matches_scalar_on_flat_map():
    """A constant background map must give the exact scalar-path caches
    (kernels.init_rates flattens trailing [H, W] dims)."""
    from smcdet_tpu.inference.kernels import TargetContext, init_kernel_state
    from smcdet_tpu.models.imaging import ImageModel
    from smcdet_tpu.models.priors import (
        NormalFlux,
        PointProcessPrior,
        UniformCounts,
    )
    from smcdet_tpu.models.psf import GaussianPSF

    prior = PointProcessPrior(
        min_objects=0,
        max_objects=2,
        image_height=8,
        image_width=8,
        pad=1.0,
        counts=UniformCounts(0, 2),
        flux=NormalFlux(mean=jnp.float32(500.0), stdev=jnp.float32(50.0)),
    )
    model = ImageModel(
        height=8,
        width=8,
        psf_radius=4,
        noise="poisson",
        background=jnp.float32(100.0),
        psf=GaussianPSF(stdev=jnp.float32(1.0)),
    )
    key = jax.random.key(0)
    counts = jnp.asarray([[2, 1]])
    locs = jnp.asarray(
        [[[[2.0, 2.0], [5.0, 5.0]], [[3.0, 3.0], [0.0, 0.0]]]]
    )
    fluxes = jnp.asarray([[[500.0, 450.0], [480.0, 0.0]]])
    image = model.sample(key, locs[0, 0], fluxes[0, 0])

    def caches(m):
        ctx = TargetContext(
            prior=prior,
            model=m,
            image=image[None, None],
            temperature=jnp.ones((1, 1)),
        )
        return init_kernel_state(ctx, counts, locs, fluxes)

    scalar = caches(model)
    flat_map = caches(model.replace(background=jnp.full((8, 8), 100.0)))
    np.testing.assert_allclose(
        np.asarray(scalar.rate), np.asarray(flat_map.rate), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(scalar.parent_ll),
        np.asarray(flat_map.parent_ll),
        rtol=1e-6,
    )

    # a genuinely varying map changes the rate exactly by the map delta
    bump = jnp.zeros((8, 8)).at[3, 4].set(25.0)
    varied = caches(model.replace(background=100.0 + bump))
    delta = np.array(varied.rate - scalar.rate).reshape(1, 2, 8, 8)
    np.testing.assert_allclose(delta[..., 3, 4], 25.0, rtol=1e-6)
    delta[..., 3, 4] = 0.0
    np.testing.assert_allclose(delta, 0.0, atol=1e-6)
