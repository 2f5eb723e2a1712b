import jax
import jax.numpy as jnp
import numpy as np

from smcdet_tpu.models.priors import (
    GeometricCounts,
    M71Prior,
    ParetoStarPrior,
    PoissonCounts,
    StarPrior,
)


class TestSampling:
    def test_unstratified_shapes_and_masking(self):
        prior = ParetoStarPrior(
            min_objects=0,
            max_objects=8,
            image_height=8,
            image_width=8,
            flux_scale=500.0,
            flux_alpha=1.0,
            pad=2.0,
        )
        counts, locs, fluxes = prior.sample(jax.random.key(0), 128)
        assert counts.shape == (128,)
        assert locs.shape == (128, 8, 2)
        assert fluxes.shape == (128, 8)
        c = np.asarray(counts)
        f = np.asarray(fluxes)
        l = np.asarray(locs)
        for i in range(128):
            assert (f[i, c[i]:] == 0).all()
            assert (l[i, c[i]:] == 0).all()
            assert (f[i, : c[i]] >= 500.0).all()
            assert (l[i, : c[i]] >= -2.0).all() and (l[i, : c[i]] <= 10.0).all()

    def test_stratified_dense_axis(self):
        prior = ParetoStarPrior(
            min_objects=1,
            max_objects=4,
            image_height=8,
            image_width=8,
            flux_scale=500.0,
            flux_alpha=1.0,
            pad=2.0,
        )
        strata, locs, fluxes = prior.sample_stratified(jax.random.key(1), 16)
        assert strata.shape == (4,)
        np.testing.assert_array_equal(np.asarray(strata), [1, 2, 3, 4])
        assert locs.shape == (4, 16, 4, 2)
        assert fluxes.shape == (4, 16, 4)
        f = np.asarray(fluxes)
        for c in range(4):
            assert (f[c, :, : c + 1] > 0).all()
            assert (f[c, :, c + 1 :] == 0).all()


class TestLogProb:
    def test_count_distributions_vs_scipy(self):
        import scipy.stats as st

        k = np.arange(0, 10)
        pois = PoissonCounts(rate=jnp.float32(7.68))
        np.testing.assert_allclose(
            np.asarray(pois.log_prob(jnp.asarray(k))),
            st.poisson(7.68).logpmf(k),
            rtol=1e-4,
        )
        p = 1 - np.exp(-1.5)
        geom = GeometricCounts()
        np.testing.assert_allclose(
            np.asarray(geom.log_prob(jnp.asarray(k))),
            st.geom(p, loc=-1).logpmf(k),
            rtol=1e-4,
        )

    def test_truncated_count_log_prob_normalises(self):
        prior = M71Prior(
            min_objects=0,
            max_objects=10,
            counts_rate=0.03,
            image_height=8,
            image_width=8,
            flux_alpha=0.214,
            flux_lower=0.252,
            flux_upper=1804.679,
            pad=4.0,
        )
        support = jnp.arange(0, 11)
        lp = prior.count_log_prob_truncated(support)
        np.testing.assert_allclose(float(jnp.exp(lp).sum()), 1.0, rtol=1e-5)

    def test_log_prob_matches_reference_pareto_star(self):
        from reference_harness import load_reference

        smcdet = load_reference()
        import torch

        prior = ParetoStarPrior(
            min_objects=0,
            max_objects=6,
            image_height=8,
            image_width=8,
            flux_scale=570.0,
            flux_alpha=0.96,
            pad=2.0,
        )
        ref = smcdet.prior.ParetoStarPrior(
            min_objects=0,
            max_objects=6,
            image_height=8,
            image_width=8,
            flux_scale=570.0,
            flux_alpha=0.96,
            pad=2,
        )
        counts, locs, fluxes = prior.sample(jax.random.key(5), 32)
        ours = prior.log_prob(counts, locs, fluxes)
        ref_lp = ref.log_prob(
            torch.tensor(np.asarray(counts, dtype=np.float32)).view(1, 1, 32),
            torch.tensor(np.asarray(locs)).view(1, 1, 32, 6, 2),
            torch.tensor(np.asarray(fluxes)).view(1, 1, 32, 6),
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref_lp.numpy()[0, 0], rtol=2e-4, atol=1e-4
        )

    def test_log_prob_matches_reference_m71(self):
        from reference_harness import load_reference

        smcdet = load_reference()
        import torch

        kwargs = dict(
            min_objects=0,
            max_objects=5,
            counts_rate=0.03,
            image_height=8,
            image_width=8,
            flux_alpha=0.214,
            flux_lower=0.252,
            flux_upper=1804.679,
        )
        prior = M71Prior(pad=4.0, **kwargs)
        ref = smcdet.prior.M71Prior(pad=4, **kwargs)
        counts, locs, fluxes = prior.sample(jax.random.key(6), 32)
        ours = prior.log_prob(counts, locs, fluxes)
        ref_lp = ref.log_prob(
            torch.tensor(np.asarray(counts, dtype=np.float32)).view(1, 1, 32),
            torch.tensor(np.asarray(locs)).view(1, 1, 32, 5, 2),
            torch.tensor(np.asarray(fluxes)).view(1, 1, 32, 5),
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref_lp.numpy()[0, 0], rtol=2e-4, atol=1e-4
        )

    def test_normal_flux_star_prior(self):
        prior = StarPrior(
            min_objects=2,
            max_objects=2,
            image_height=8,
            image_width=8,
            flux_mean=1000.0,
            flux_stdev=100.0,
            pad=0.0,
        )
        counts = jnp.asarray([2], dtype=jnp.int32)
        locs = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]])
        fluxes = jnp.asarray([[1000.0, 1100.0]])
        lp = float(prior.log_prob(counts, locs, fluxes)[0])
        import scipy.stats as st

        expected = (
            0.0  # count pmf (degenerate uniform)
            + 4 * (-np.log(8.0))
            + st.norm(1000.0, 100.0).logpdf([1000.0, 1100.0]).sum()
        )
        np.testing.assert_allclose(lp, expected, rtol=1e-5)
