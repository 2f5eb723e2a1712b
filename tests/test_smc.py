"""End-to-end tests of the CS-SMC driver (inference/smc.py).

The reference has no automated tests; its correctness evidence is
statistical (SURVEY.md §4). These tests cover the deterministic contract
(termination, weight/logZ bookkeeping, shapes) plus a small posterior
sanity check on an unambiguous synthetic image, and sharded-vs-unsharded
agreement on a virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcdet_tpu.inference.kernels import SingleComponentMH
from smcdet_tpu.inference.smc import SMCConfig, SMCSampler, run_csmc, tile_image
from smcdet_tpu.models.imaging import ImageModel
from smcdet_tpu.models.priors import (
    NormalFlux,
    PointProcessPrior,
    UniformCounts,
)
from smcdet_tpu.models.psf import GaussianPSF


def make_setup(max_objects=3, tile=8):
    prior = PointProcessPrior(
        min_objects=0,
        max_objects=max_objects,
        image_height=tile,
        image_width=tile,
        pad=1.0,
        counts=UniformCounts(low=0, high=max_objects),
        flux=NormalFlux(mean=jnp.float32(2000.0), stdev=jnp.float32(200.0)),
    )
    model = ImageModel(
        height=tile,
        width=tile,
        psf_radius=4,
        noise="poisson",
        background=jnp.float32(100.0),
        psf=GaussianPSF(stdev=jnp.float32(1.0)),
    )
    kernel = SingleComponentMH(
        num_iters=20,
        locs_stdev=jnp.float32(0.25),
        fluxes_stdev=jnp.float32(50.0),
        fluxes_min=jnp.float32(100.0),
        fluxes_max=jnp.float32(5000.0),
    )
    return prior, model, kernel


def two_star_image():
    """Unambiguous tile: two bright well-separated stars."""
    prior, model, kernel = make_setup()
    locs = jnp.asarray([[2.0, 2.5], [5.5, 5.0], [0.0, 0.0]])
    fluxes = jnp.asarray([2000.0, 2100.0, 0.0])
    image = model.sample(jax.random.key(42), locs, fluxes)
    return image, prior, model, kernel


class TestRunCSMC:
    @pytest.fixture(scope="class")
    def result(self):
        image, prior, model, kernel = two_star_image()
        cfg = SMCConfig(
            num_catalogs=256,
            ess_threshold_prop=0.5,
            resample_method="systematic",
            max_smc_iters=50,
            flux_detection_threshold=200.0,
        )
        res = jax.jit(run_csmc)(
            jax.random.key(0), image[None], prior, model, kernel, cfg
        )
        return jax.block_until_ready(res)

    def test_terminates_at_temperature_one(self, result):
        np.testing.assert_allclose(np.asarray(result.temperature), 1.0)
        assert int(result.num_iters) < 50

    def test_shapes_and_weights(self, result):
        T, CN = result.counts.shape
        assert T == 1 and CN == 4 * 256
        w = np.asarray(result.weights)
        np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
        assert np.isfinite(np.asarray(result.log_normalizing_constant)).all()

    def test_posterior_count_is_two(self, result):
        # Posterior count pmf = softmax over per-stratum logZ; stratum 2
        # (index 2) should dominate for two bright separated stars.
        lz = np.asarray(result.log_normalizing_constant[0])
        pmf = np.exp(lz - lz.max())
        pmf = pmf / pmf.sum()
        assert pmf.argmax() == 2, pmf
        assert pmf[2] > 0.5, pmf

    def test_pruned_counts_match_posterior(self, result):
        # Weighted pruned-count posterior mean should be near 2.
        mean = float(
            (np.asarray(result.weights) * np.asarray(result.pruned_counts)).sum()
        )
        assert 1.5 < mean < 2.5, mean

    def test_acceptance_rate_reasonable(self, result):
        # applied-move rate: ~half the slots are inactive and the chain is
        # near equilibrium, so small-but-nonzero is the healthy regime
        acc = float(result.acc_rate[0])
        assert 0.003 < acc <= 1.0


@pytest.mark.slow
class TestSharding:
    def test_sharded_matches_single_device(self):
        from smcdet_tpu.parallel.sharding import shard_tiles_jit, tile_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        image, prior, model, kernel = two_star_image()
        images = jnp.tile(image[None], (8, 1, 1))
        cfg = SMCConfig(
            num_catalogs=64,
            max_smc_iters=20,
            resample_method="systematic",
        )
        key = jax.random.key(3)
        single = jax.jit(run_csmc)(key, images, prior, model, kernel, cfg)
        mesh = tile_mesh(jax.devices()[:8])
        sharded = shard_tiles_jit(run_csmc, mesh)(
            key, images, prior, model, kernel, cfg
        )
        np.testing.assert_allclose(
            np.asarray(single.log_normalizing_constant),
            np.asarray(sharded.log_normalizing_constant),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(single.temperature), np.asarray(sharded.temperature),
            rtol=1e-5,
        )


class TestTileImage:
    def test_tiling_layout(self):
        img = jnp.arange(16.0).reshape(4, 4)
        tiles = tile_image(img, 2, 2, 2)
        assert tiles.shape == (4, 2, 2)
        np.testing.assert_allclose(
            np.asarray(tiles[0]), [[0.0, 1.0], [4.0, 5.0]]
        )
        np.testing.assert_allclose(
            np.asarray(tiles[3]), [[10.0, 11.0], [14.0, 15.0]]
        )


class TestSamplerWrapper:
    def test_wrapper_runs_and_summarizes(self, capsys):
        image, prior, model, kernel = two_star_image()
        sampler = SMCSampler(
            image=image,
            tile_dim=8,
            Prior=prior,
            ImageModel=model,
            MutationKernel=kernel,
            num_catalogs=64,
            max_smc_iters=20,
            flux_detection_threshold=200.0,
        )
        res = sampler.run(jax.random.key(1))
        assert res.counts.shape == (1, 4 * 64)
        sampler.summarize()
        out = capsys.readouterr().out
        assert "posterior" in out


class TestMALA:
    def test_mala_kernel_end_to_end(self):
        from smcdet_tpu.inference.kernels import SingleComponentMALA

        image, prior, model, _ = two_star_image()
        kernel = SingleComponentMALA(
            num_iters=15,
            locs_step=jnp.float32(0.15),
            fluxes_step=jnp.float32(30.0),
            fluxes_min=jnp.float32(100.0),
            fluxes_max=jnp.float32(5000.0),
        )
        cfg = SMCConfig(
            num_catalogs=96,
            resample_method="systematic",
            max_smc_iters=40,
            flux_detection_threshold=200.0,
        )
        r = jax.jit(run_csmc)(
            jax.random.key(2), image[None], prior, model, kernel, cfg
        )
        np.testing.assert_allclose(np.asarray(r.temperature), 1.0)
        lz = np.asarray(r.log_normalizing_constant[0])
        pmf = np.exp(lz - lz.max())
        pmf = pmf / pmf.sum()
        assert pmf.argmax() == 2, pmf
        assert 0.01 < float(r.acc_rate[0]) <= 1.0


class TestFixedSchedule:
    def test_ladder_followed_exactly(self):
        image, prior, model, kernel = two_star_image()
        ladder = (0.1, 0.3, 0.6, 1.0)
        cfg = SMCConfig(
            num_catalogs=64,
            max_smc_iters=20,
            record_history=True,
            fixed_schedule=ladder,
        )
        r = jax.jit(run_csmc)(
            jax.random.key(3), image[None], prior, model, kernel, cfg
        )
        assert int(r.num_iters) == 3  # iterations after the init temper
        temps = np.asarray(r.history["temperature"])[:3, 0]
        np.testing.assert_allclose(temps, [0.3, 0.6, 1.0], atol=1e-6)
        np.testing.assert_allclose(float(r.temperature[0]), 1.0)
