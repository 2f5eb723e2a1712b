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
        # Long-run MH on the unambiguous two-star image: the modal pruned
        # count should be 2 (the saturated third slot wanders below the
        # detection threshold or out of bounds).
        pc = np.asarray(sampler.result.pruned_counts)
        vals, cnts = np.unique(pc, return_counts=True)
        assert vals[cnts.argmax()] == 2, dict(zip(vals.tolist(), cnts.tolist()))

    def test_located_stars_near_truth(self, sampler):
        r = sampler.result
        # Mean of matched locations across kept samples should sit near the
        # true star positions (2, 2.5) and (5.5, 5).
        locs = np.asarray(r.pruned_locs[0])  # [K, 3, 2]
        counts = np.asarray(r.pruned_counts[0])
        two = locs[counts == 2][:, :2]  # [k, 2, 2]
        mean_locs = two.reshape(-1, 2)
        truth = np.asarray([[2.0, 2.5], [5.5, 5.0]])
        # every sample-star is within 1 px of one of the true stars
        d = np.linalg.norm(mean_locs[:, None] - truth[None], axis=-1).min(-1)
        assert (d < 1.0).mean() > 0.9
