import jax
import jax.numpy as jnp
import numpy as np

from smcdet_tpu.ops.catalogs import compact_catalog, prune_catalog
from smcdet_tpu.ops.resampling import (
    gather_particles,
    multinomial_indices,
    systematic_indices,
)
from smcdet_tpu.ops.tempering import ess_at_delta, solve_tempering_step


class TestResampling:
    def test_multinomial_unbiased(self):
        w = jnp.asarray([0.1, 0.2, 0.3, 0.4])
        idx = multinomial_indices(jax.random.key(0), w, 40000)
        freq = np.bincount(np.asarray(idx), minlength=4) / 40000
        np.testing.assert_allclose(freq, np.asarray(w), atol=0.01)

    def test_systematic_counts_are_floor_or_ceil(self):
        w = jnp.asarray([0.05, 0.25, 0.1, 0.6])
        n = 1000
        idx = systematic_indices(jax.random.key(1), w, n)
        counts = np.bincount(np.asarray(idx), minlength=4)
        expected = np.asarray(w) * n
        assert (counts >= np.floor(expected)).all()
        assert (counts <= np.ceil(expected)).all()

    def test_batched_shapes(self):
        w = jax.random.dirichlet(jax.random.key(2), jnp.ones(16), (3, 5))
        idx = multinomial_indices(jax.random.key(3), w, 32)
        assert idx.shape == (3, 5, 32)
        assert int(idx.max()) < 16
        x = jax.random.normal(jax.random.key(4), (3, 5, 16, 4, 2))
        f = jax.random.normal(jax.random.key(5), (3, 5, 16, 4))
        xg, fg = gather_particles(idx, x, f, particle_axis=2)
        assert xg.shape == (3, 5, 32, 4, 2)
        assert fg.shape == (3, 5, 32, 4)
        np.testing.assert_allclose(
            np.asarray(xg[1, 2, 7]), np.asarray(x[1, 2, int(idx[1, 2, 7])])
        )


class TestTempering:
    @staticmethod
    def _brentq_reference(loglik, temperature, ess_target):
        """The reference host-side solve (sampler.py:99-125), in scipy."""
        from scipy.optimize import brentq
        from scipy.special import logsumexp

        def objective(delta):
            num = 2 * logsumexp(delta * loglik)
            den = logsumexp(2 * delta * loglik)
            return np.exp(num - den) - ess_target

        hi = 1.0 - temperature
        if objective(hi) < 0:
            return brentq(objective, 0.0, hi, xtol=1e-6, rtol=1e-6)
        return hi

    def test_matches_brentq(self):
        rng = np.random.default_rng(0)
        for temp in [0.0, 0.3, 0.9]:
            loglik = rng.normal(-200.0, 30.0, size=512)
            ours = float(
                solve_tempering_step(
                    jnp.asarray(loglik, dtype=jnp.float64),
                    jnp.asarray(temp, dtype=jnp.float64),
                    256.0,
                )
            )
            expected = self._brentq_reference(loglik, temp, 256.0)
            np.testing.assert_allclose(ours, expected, atol=2e-6)

    def test_full_step_branch(self):
        # Nearly equal logliks: ESS stays ~N, take the whole remaining step.
        loglik = jnp.zeros(64) - 5.0
        delta = float(solve_tempering_step(loglik, jnp.asarray(0.25), 32.0))
        np.testing.assert_allclose(delta, 0.75, atol=1e-6)

    def test_batched(self):
        rng = np.random.default_rng(1)
        loglik = jnp.asarray(rng.normal(-100, 20, size=(4, 7, 256)))
        temp = jnp.zeros((4, 7))
        delta = solve_tempering_step(loglik, temp, 128.0)
        assert delta.shape == (4, 7)
        ess = ess_at_delta(loglik, delta)
        np.testing.assert_allclose(np.asarray(ess), 128.0, rtol=1e-3)


class TestCatalogOps:
    def test_compact_moves_kept_to_front(self):
        locs = jnp.arange(10.0).reshape(5, 2)[None] + 1.0  # [1, 5, 2]
        fluxes = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 5.0]])
        keep = jnp.asarray([[False, True, False, True, False]])
        counts, l, f = compact_catalog(locs, fluxes, keep)
        assert int(counts[0]) == 2
        np.testing.assert_allclose(np.asarray(f[0]), [2.0, 4.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(np.asarray(l[0, 0]), [3.0, 4.0])
        np.testing.assert_allclose(np.asarray(l[0, 2:]), 0.0)

    def test_prune_thresholds(self):
        locs = jnp.asarray(
            [[[4.0, 4.0], [-1.0, 4.0], [4.0, 9.0], [2.0, 2.0]]]
        )
        fluxes = jnp.asarray([[100.0, 100.0, 100.0, 1.0]])
        counts, l, f = prune_catalog(
            locs, fluxes, height=8, width=8, flux_threshold=50.0
        )
        assert int(counts[0]) == 1
        np.testing.assert_allclose(np.asarray(l[0, 0]), [4.0, 4.0])
