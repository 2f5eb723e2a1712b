"""Tests for the saturated-model MH baseline (inference/mcmc.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcdet_tpu.inference.mcmc import MHSampler
from tests.test_smc import make_setup, two_star_image


class TestMHSampler:
    @pytest.fixture(scope="class")
    def sampler(self):
        image, prior, model, _ = two_star_image()
        s = MHSampler(
            image=image,
            tile_dim=8,
            Prior=prior,
            ImageModel=model,
            locs_stdev=0.25,
            fluxes_stdev=50.0,
            flux_detection_threshold=500.0,
            num_samples_total=3000,
            num_samples_burnin=1000,
            keep_every_k=2,
            fluxes_min=100.0,
            fluxes_max=5000.0,
        )
        s.run(jax.random.key(0))
        return s

    def test_chain_shapes(self, sampler):
        r = sampler.result
        K = (3000 - 1000 + 1) // 2
        assert r.locs.shape == (1, K, 3, 2)
        assert r.fluxes.shape == (1, K, 3)
        assert r.pruned_counts.shape == (1, K)

    def test_acceptance_rate(self, sampler):
        acc = float(sampler.result.acc_rate[0])
        assert 0.05 < acc < 0.95, acc

    def test_detects_two_stars(self, sampler):
        # Long-run MH on the unambiguous two-star image. Single-site
        # saturated MH can fall into a stable "split" mode where two slots
        # share one star's flux (the reference MHsampler exhibits the
        # identical trap — it is the paper's motivation for CS-SMC), so the
        # pruned count is 2 or 3; the total flux must be recovered either
        # way (true total 4100).
        r = sampler.result
        pc = np.asarray(r.pruned_counts)
        vals, cnts = np.unique(pc, return_counts=True)
        assert vals[cnts.argmax()] in (2, 3), dict(
            zip(vals.tolist(), cnts.tolist())
        )
        total_flux = np.asarray(r.pruned_fluxes).sum(-1).mean()
        assert abs(total_flux - 4100.0) / 4100.0 < 0.1, total_flux

    def test_empty_start(self, sampler):
        # The chain starts with every slot's flux at the support floor
        # (reference sampler.py:360-367 inits slot fluxes to zero): no
        # detectable stars at step 0, stars grow in as the likelihood
        # demands. A full prior draw instead seeds bright stars that
        # single-site MH essentially never kills (stuck split modes with
        # acc ~0.02 and pruned_count pinned at max_objects).
        import jax.numpy as jnp

        from smcdet_tpu.inference.mcmc import MCMCConfig, run_mh

        image, prior, model, _ = two_star_image()
        cfg = MCMCConfig(
            num_samples_total=1,
            num_samples_burnin=0,
            keep_every_k=1,
            flux_detection_threshold=500.0,
        )
        res = run_mh(
            jax.random.key(0),
            image[None],
            prior,
            model,
            sampler.kernel,
            cfg,
        )
        # after a single sweep at most one slot has moved off the floor
        floor = jnp.asarray(sampler.kernel.fluxes_min)
        assert (np.asarray(res.fluxes[0, 0]) != float(floor)).sum() <= 1

    def test_located_stars_near_truth(self, sampler):
        r = sampler.result
        # Every detectable sampled star should sit near a true star
        # position, (2, 2.5) or (5.5, 5) — true in a split mode too, where
        # the sharing slots are co-located with the star they split.
        locs = np.asarray(r.pruned_locs[0])  # [K, 3, 2]
        counts = np.asarray(r.pruned_counts[0])  # [K]
        active = np.arange(locs.shape[1])[None, :] < counts[:, None]
        stars = locs[active]  # [n, 2]
        truth = np.asarray([[2.0, 2.5], [5.5, 5.0]])
        d = np.linalg.norm(stars[:, None] - truth[None], axis=-1).min(-1)
        assert (d < 1.0).mean() > 0.9


class TestRJMH:
    def test_finds_exact_count(self):
        # The reversible-jump chain (birth/death moves) escapes the split
        # modes that pin the saturated sampler at 3 detectable stars: a
        # death of one split partner is a single accepted move. Modal
        # count must be exactly 2 here.
        import jax.numpy as jnp

        from smcdet_tpu.inference.mcmc import MCMCConfig, run_rjmh
        from smcdet_tpu.inference.transdimensional import BirthDeathMH
        from smcdet_tpu.inference.kernels import SingleComponentMH

        image, prior, model, _ = two_star_image()
        move = SingleComponentMH(
            num_iters=1,
            locs_stdev=jnp.float32(0.1),
            fluxes_stdev=jnp.float32(40.0),
            fluxes_min=jnp.float32(100.0),
            fluxes_max=jnp.float32(5000.0),
        )
        kernel = BirthDeathMH(num_iters=1, move=move)
        cfg = MCMCConfig(
            num_samples_total=6000,
            num_samples_burnin=3000,
            keep_every_k=2,
            flux_detection_threshold=500.0,
        )
        res = jax.jit(
            lambda k, im: run_rjmh(k, im, prior, model, kernel, cfg)
        )(jax.random.key(0), image[None])
        pc = np.asarray(res.pruned_counts[0])
        vals, cnts = np.unique(pc, return_counts=True)
        assert vals[cnts.argmax()] == 2, dict(zip(vals.tolist(), cnts.tolist()))
        assert cnts.max() / pc.size > 0.9
        total = np.asarray(res.pruned_fluxes[0]).sum(-1)
        med = np.median(total[pc == 2])
        assert abs(med - 4100.0) / 4100.0 < 0.1, med


class TestEmptyStartSupport:
    def test_pareto_prior_with_zero_fluxes_min_not_frozen(self):
        # Regression: the empty start pinned slot fluxes at
        # kernel.fluxes_min; with the default fluxes_min=0 and a Pareto
        # flux prior the initial logprior is +inf, every acceptance ratio
        # is NaN, and the chain silently freezes at the all-zero state.
        # The floor now clamps into the flux prior's support.
        import jax.numpy as jnp

        from smcdet_tpu.inference.mcmc import MCMCConfig, run_mh
        from smcdet_tpu.inference.kernels import SingleComponentMH
        from smcdet_tpu.models.imaging import M71ImageModel
        from smcdet_tpu.models.priors import M71Prior

        prior = M71Prior(
            min_objects=0, max_objects=3, image_height=8, image_width=8,
            pad=1.0, counts_rate=0.03, flux_alpha=0.214,
            flux_lower=0.252, flux_upper=1804.0,
        )
        model = M71ImageModel(
            image_height=8, image_width=8, background=865.0,
            adu_per_nmgy=856.0,
            psf_params=(1.51, 4.85, 1.32, 3.0, 0.09, 0.002),
            psf_radius=8, noise_additive=0.001, noise_multiplicative=1.94,
        )
        image = model.sample(
            jax.random.key(0),
            jnp.asarray([[4.0, 4.0], [0.0, 0.0], [0.0, 0.0]]),
            jnp.asarray([300.0, 0.0, 0.0]),
        )
        kernel = SingleComponentMH(
            num_iters=1,
            locs_stdev=jnp.float32(0.1),
            fluxes_stdev=jnp.float32(2.5),
            # deliberately below the Pareto support floor (the default)
            fluxes_min=jnp.float32(0.0),
            fluxes_max=jnp.float32(1804.0),
        )
        cfg = MCMCConfig(
            num_samples_total=2000,
            num_samples_burnin=1000,
            keep_every_k=2,
            flux_detection_threshold=0.7,
        )
        res = run_mh(jax.random.key(1), image[None], prior, model, kernel, cfg)
        assert float(res.acc_rate[0]) > 0.01, float(res.acc_rate[0])
        assert np.isfinite(np.asarray(res.fluxes)).all()
        # the bright star is found
        pc = np.asarray(res.pruned_counts[0])
        vals, cnts = np.unique(pc, return_counts=True)
        assert vals[cnts.argmax()] >= 1, dict(zip(vals.tolist(), cnts.tolist()))
