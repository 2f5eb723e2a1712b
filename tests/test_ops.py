import jax
import jax.numpy as jnp
import numpy as np

from smcdet_tpu.ops.catalogs import compact_catalog, prune_catalog
from smcdet_tpu.ops.resampling import (
    gather_particles,
    multinomial_indices,
    stratified_indices,
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

    def test_large_axis_fallback_matches_numpy(self):
        # N > 4096 takes the vmapped-take fallback (the one-hot MXU path
        # is the wrong regime there); it must be an exact gather
        N = 4100
        x = jax.random.normal(jax.random.key(6), (2, N, 3, 2))
        f = jax.random.normal(jax.random.key(7), (2, N, 3))
        idx = jax.random.randint(jax.random.key(8), (2, N), 0, N)
        xg, fg = gather_particles(idx, x, f, particle_axis=1)
        i = np.asarray(idx)
        np.testing.assert_array_equal(
            np.asarray(xg), np.asarray(x)[np.arange(2)[:, None], i]
        )
        np.testing.assert_array_equal(
            np.asarray(fg), np.asarray(f)[np.arange(2)[:, None], i]
        )


class TestStratifiedResampling:
    """The bridge's intracount resampling (aggregate.py:485-521 parity)."""

    @staticmethod
    def _setup(seed=0, N=64, C=3):
        rng = np.random.default_rng(seed)
        strata = jnp.asarray(rng.integers(0, C, N))
        w = jnp.asarray(rng.gamma(1.0, 1.0, N).astype(np.float32))
        return strata, w, C

    def test_preserves_stratum_structure(self):
        strata, w, C = self._setup()
        for method in ("multinomial", "systematic"):
            idx = stratified_indices(
                jax.random.key(1), w, strata, C, method
            )
            s = np.asarray(strata)
            assert (s[np.asarray(idx)] == s).all(), method

    def test_systematic_counts_are_floor_or_ceil_within_stratum(self):
        # Mirrors TestResampling.test_systematic_counts_are_floor_or_ceil:
        # inside each stratum the ancestor counts must be the floor or
        # ceil of n_c * normalized weight — the systematic exactness
        # property the compacted-CDF construction restores.
        strata, w, C = self._setup(seed=3, N=512, C=4)
        idx = np.asarray(
            stratified_indices(jax.random.key(2), w, strata, C, "systematic")
        )
        s, wn = np.asarray(strata), np.asarray(w)
        for c in range(C):
            members = np.flatnonzero(s == c)
            n_c = members.size
            p = wn[members] / wn[members].sum()
            counts = np.bincount(
                np.searchsorted(members, idx[s == c]), minlength=n_c
            )
            expected = n_c * p
            assert (counts >= np.floor(expected)).all()
            assert (counts <= np.ceil(expected)).all()

    def test_multinomial_unbiased_within_stratum(self):
        strata = jnp.asarray(np.repeat([0, 1], 2000))
        w = jnp.concatenate(
            [jnp.asarray([1.0, 3.0] * 1000), jnp.ones(2000)]
        )
        idx = np.asarray(
            stratified_indices(jax.random.key(4), w, strata, 2, "multinomial")
        )
        first = idx[:2000]
        # within stratum 0 the odd positions carry 3x the weight
        frac_odd = (first % 2 == 1).mean()
        np.testing.assert_allclose(frac_odd, 0.75, atol=0.03)

    def test_degenerate_strata_stay_in_stratum(self):
        # Two documented edge cases: a stratum whose weights all
        # underflow to exactly 0 (flat zero CDF), and the u == 0.0 corner
        # (jax.random.uniform includes 0) — both used to escape to an
        # out-of-stratum extreme index. The zero-weight stratum must fall
        # back to uniform over its members.
        strata, w, C = self._setup(seed=7, N=96, C=4)
        w = jnp.where(strata == 2, 0.0, w)  # stratum 2: all-zero weights
        s = np.asarray(strata)
        for method in ("multinomial", "systematic"):
            for k in range(20):
                idx = np.asarray(
                    stratified_indices(
                        jax.random.key(100 + k), w, strata, C, method
                    )
                )
                assert (s[idx] == s).all(), (method, k)
        # uniform fallback actually spreads over the stratum's members
        members2 = np.flatnonzero(s == 2)
        idx = np.asarray(
            stratified_indices(
                jax.random.key(11), w, strata, C, "systematic"
            )
        )
        assert len(np.unique(idx[s == 2])) > len(members2) // 2

    def test_batched(self):
        strata, w, C = self._setup(seed=5, N=32)
        strata_b = jnp.broadcast_to(strata, (2, 3, 32))
        w_b = jnp.broadcast_to(w, (2, 3, 32))
        for method in ("multinomial", "systematic"):
            idx = stratified_indices(
                jax.random.key(6), w_b, strata_b, C, method
            )
            assert idx.shape == (2, 3, 32)
            s = np.asarray(strata_b)
            assert (np.take_along_axis(s, np.asarray(idx), -1) == s).all()


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
