import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from smcdet_tpu.distributions import (
    DiscreteUniform,
    TruncatedDiagonalMVN,
    TruncatedPareto,
    truncated_normal_log_prob,
    truncated_normal_sample,
)


class TestDiscreteUniform:
    def test_log_prob(self):
        d = DiscreteUniform(low=2, high=6)
        vals = jnp.arange(0, 9)
        lp = d.log_prob(vals)
        expected = st.randint(2, 7).logpmf(np.arange(0, 9))
        np.testing.assert_allclose(np.asarray(lp), expected, rtol=5e-5)

    def test_sample_range_and_uniformity(self):
        d = DiscreteUniform(low=0, high=4)
        s = d.sample(jax.random.key(0), (20000,))
        s = np.asarray(s)
        assert s.min() == 0 and s.max() == 4
        freqs = np.bincount(s, minlength=5) / s.size
        np.testing.assert_allclose(freqs, 0.2, atol=0.02)


class TestTruncatedNormal:
    def test_log_prob_vs_scipy(self):
        mu, sigma, lb, ub = 1.0, 0.7, 0.0, 2.5
        x = np.linspace(0.05, 2.45, 17)
        lp = truncated_normal_log_prob(jnp.asarray(x), mu, sigma, lb, ub)
        a, b = (lb - mu) / sigma, (ub - mu) / sigma
        expected = st.truncnorm(a, b, loc=mu, scale=sigma).logpdf(x)
        np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-4)

    def test_sample_distribution(self):
        mu, sigma, lb, ub = 0.3, 1.2, -1.0, 1.0
        s = truncated_normal_sample(
            jax.random.key(1), mu, sigma, lb, ub, shape=(50000,)
        )
        s = np.asarray(s)
        assert (s >= lb).all() and (s <= ub).all()
        a, b = (lb - mu) / sigma, (ub - mu) / sigma
        ref = st.truncnorm(a, b, loc=mu, scale=sigma)
        assert abs(s.mean() - ref.mean()) < 0.01
        assert abs(s.std() - ref.std()) < 0.01
        ks = st.kstest(s[:5000], ref.cdf)
        assert ks.pvalue > 1e-4

    def test_class_broadcasting(self):
        mu = jnp.array([[0.0, 1.0], [2.0, 3.0]])
        d = TruncatedDiagonalMVN(
            mu=mu, sigma=jnp.float32(0.5), lb=mu - 1.0, ub=mu + 1.0
        )
        s = d.sample(jax.random.key(2))
        assert s.shape == (2, 2)
        assert bool(((s >= mu - 1.0) & (s <= mu + 1.0)).all())
        lp = d.log_prob(s)
        assert lp.shape == (2, 2)
        assert bool(jnp.isfinite(lp).all())


class TestTruncatedPareto:
    def test_log_prob_vs_scipy(self):
        alpha, lower, upper = 0.214, 0.252, 1804.679  # fitted M71 params
        x = np.geomspace(0.3, 1500.0, 25)
        d = TruncatedPareto(alpha=alpha, lower=lower, upper=upper)
        lp = d.log_prob(jnp.asarray(x, dtype=jnp.float64))
        c = upper / lower
        expected = st.truncpareto(alpha, c, scale=lower).logpdf(x)
        np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-3)

    def test_sample_distribution(self):
        alpha, lower, upper = 1.3, 1.0, 50.0
        d = TruncatedPareto(alpha=alpha, lower=lower, upper=upper)
        s = np.asarray(d.sample(jax.random.key(3), (50000,)))
        assert (s >= lower).all() and (s <= upper).all()
        ref = st.truncpareto(alpha, upper / lower, scale=lower)
        ks = st.kstest(s[:5000], ref.cdf)
        assert ks.pvalue > 1e-4


class TestReferenceParity:
    """Bit-level-formula parity against the reference torch implementation."""

    @pytest.mark.slow
    def test_truncated_normal_log_prob_matches_reference(self):
        from reference_harness import load_reference

        smcdet = load_reference()
        import torch

        mu = np.random.default_rng(0).uniform(-1, 1, size=(4, 3)).astype(np.float32)
        val = np.clip(mu + 0.3, -1.0, 2.0).astype(np.float32)
        ref = smcdet.distributions.TruncatedDiagonalMVN(
            torch.tensor(mu), torch.tensor(0.5), torch.tensor(-1.0), torch.tensor(2.0)
        ).log_prob(torch.tensor(val))
        ours = truncated_normal_log_prob(
            jnp.asarray(val), jnp.asarray(mu), 0.5, -1.0, 2.0
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4, atol=5e-5)

    def test_truncated_pareto_matches_reference(self):
        from reference_harness import load_reference

        smcdet = load_reference()
        import torch

        alpha, lower, upper = 0.214, 0.252, 1804.679
        x = np.geomspace(0.3, 1500.0, 11).astype(np.float32)
        ref = smcdet.distributions.TruncatedPareto(alpha, lower, upper).log_prob(
            torch.tensor(x)
        )
        ours = TruncatedPareto(alpha=alpha, lower=lower, upper=upper).log_prob(
            jnp.asarray(x)
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4)
