"""Tests for transdimensional (birth/death) SMC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcdet_tpu.inference.kernels import SingleComponentMH
from smcdet_tpu.inference.transdimensional import (
    BirthDeathMH,
    TDSMCConfig,
    run_tdsmc,
)
from tests.test_smc import two_star_image


@pytest.fixture(scope="module")
def result():
    image, prior, model, move = two_star_image()
    kernel = BirthDeathMH(
        num_iters=40,
        move=move.replace(num_iters=1, backend="xla"),
        prob_birth=0.2,
        prob_death=0.2,
    )
    cfg = TDSMCConfig(
        num_particles=512,
        resample_method="systematic",
        max_smc_iters=60,
        flux_detection_threshold=200.0,
    )
    r = jax.jit(run_tdsmc)(
        jax.random.key(0), image[None], prior, model, kernel, cfg
    )
    return jax.block_until_ready(r)


class TestTDSMC:
    def test_terminates(self, result):
        np.testing.assert_allclose(np.asarray(result.temperature), 1.0)
        assert int(result.num_iters) < 60

    def test_count_posterior_mode_two(self, result):
        counts = np.asarray(result.pruned_counts[0])
        vals, freq = np.unique(counts, return_counts=True)
        mode = vals[freq.argmax()]
        assert mode == 2, dict(zip(vals.tolist(), freq.tolist()))
        assert freq.max() / counts.size > 0.5

    def test_counts_within_prior_support(self, result):
        counts = np.asarray(result.counts)
        assert counts.min() >= 0 and counts.max() <= 3

    def test_flux_recovered(self, result):
        total = np.asarray(result.pruned_fluxes[0]).sum(-1)
        med = np.median(total[np.asarray(result.pruned_counts[0]) == 2])
        assert abs(med - 4100.0) / 4100.0 < 0.15, med

    def test_moves_and_jumps_both_happen(self, result):
        # applied-move rate of the final sweep set: near equilibrium at
        # temperature 1, jumps are mostly rejected — small but nonzero
        assert 0.0 < float(result.acc_rate[0]) <= 1.0
        assert np.isfinite(float(result.log_normalizing_constant[0]))


class TestSweepCacheConsistency:
    def test_cached_rate_and_loglik_track_state(self):
        # Regression: birth/death applications must be based on the
        # pre-move arrays — basing them on the move sweep's output bakes
        # the move into the state while rate/loglik/logprior caches are
        # updated relative to the unmoved state, so the caches drift
        # linearly off the particle state over a long chain (observed:
        # rate error ~300 counts after 2k sweeps, sampled fluxes inflated
        # by 45%).
        from functools import partial

        from smcdet_tpu.inference.kernels import (
            TargetContext,
            init_kernel_state,
        )
        from smcdet_tpu.inference.transdimensional import TDKernelState

        image, prior, model, move = two_star_image()
        kernel = BirthDeathMH(
            num_iters=1,
            move=move.replace(
                num_iters=1,
                backend="xla",
                locs_stdev=jnp.float32(0.05),
                fluxes_stdev=jnp.float32(25.0),
            ),
        )
        ctx = TargetContext(
            prior=prior,
            model=model,
            image=image[None][:, None],
            temperature=jnp.ones((1, 1)),
        )
        M = prior.max_objects
        counts = jnp.zeros((1, 1), jnp.int32)
        state = TDKernelState(
            counts=counts,
            inner=init_kernel_state(
                ctx, counts, jnp.zeros((1, 1, M, 2)), jnp.zeros((1, 1, M))
            ),
        )

        @partial(jax.jit, static_argnums=2)
        def advance(state, key, n):
            def body(st, k):
                st, _ = kernel._sweep(k, ctx, st)
                return st, None

            st, _ = jax.lax.scan(body, state, jax.random.split(key, n))
            return st

        state = advance(state, jax.random.key(0), 2000)
        fresh = init_kernel_state(
            ctx, state.counts, state.inner.locs, state.inner.fluxes
        )
        np.testing.assert_allclose(
            np.asarray(state.inner.parent_ll),
            np.asarray(fresh.parent_ll),
            rtol=0,
            atol=0.5,
        )
        np.testing.assert_allclose(
            np.asarray(state.inner.logprior),
            np.asarray(fresh.logprior),
            rtol=0,
            atol=0.1,
        )
        assert float(jnp.abs(state.inner.rate - fresh.rate).max()) < 0.1


def _split_state_problem():
    """One star at the flux-prior mean, with every chain initialised in
    the SPLIT state (two half-flux stars 0.6 px apart) — the documented
    trap for single-site RJ kernels (docs/results/RESULTS.md MCMC-anchor
    study): a death of either half leaves its flux unexplained and a
    move of either half breaks the blend, so plain birth/death never
    escapes."""
    from smcdet_tpu.inference.kernels import TargetContext, init_kernel_state
    from smcdet_tpu.inference.transdimensional import TDKernelState
    from tests.test_smc import make_setup

    prior, model, move = make_setup()
    true_loc = jnp.asarray([[3.5, 3.5], [0, 0], [0, 0]], jnp.float32)
    true_flux = jnp.asarray([2000.0, 0, 0], jnp.float32)
    image = model.sample(jax.random.key(1), true_loc, true_flux)
    M = prior.max_objects
    counts0 = jnp.full((1, 64), 2, jnp.int32)
    locs0 = (
        jnp.zeros((1, 64, M, 2))
        .at[:, :, 0].set(jnp.asarray([3.2, 3.5]))
        .at[:, :, 1].set(jnp.asarray([3.8, 3.5]))
    )
    fluxes0 = (
        jnp.zeros((1, 64, M)).at[:, :, 0].set(1000.0).at[:, :, 1].set(1000.0)
    )
    ctx = TargetContext(
        prior=prior,
        model=model,
        image=image[None][:, None],
        temperature=jnp.ones((1, 1)),
    )
    state = TDKernelState(
        counts=counts0, inner=init_kernel_state(ctx, counts0, locs0, fluxes0)
    )
    return ctx, state, move.replace(num_iters=1, backend="xla")


def _advance(kernel, ctx, state, key, n):
    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def run(state, key, n):
        def body(st, k):
            st, _ = kernel._sweep(k, ctx, st)
            return st, None

        st, _ = jax.lax.scan(body, state, jax.random.split(key, n))
        return st

    return run(state, key, n)


class TestSplitMerge:
    def test_split_mode_rescue(self):
        """The coordinated merge move is the ONLY way out of the split
        state: plain birth/death chains stay lodged at count 2 forever,
        split/merge chains all collapse to the true count 1."""
        ctx, state, move1 = _split_state_problem()
        plain = BirthDeathMH(
            num_iters=1, move=move1, prob_birth=0.2, prob_death=0.2
        )
        sm = BirthDeathMH(
            num_iters=1,
            move=move1,
            prob_birth=0.15,
            prob_death=0.15,
            prob_split=0.1,
            prob_merge=0.1,
        )
        st_plain = _advance(plain, ctx, state, jax.random.key(7), 1500)
        st_sm = _advance(sm, ctx, state, jax.random.key(7), 1500)
        frac_plain = float((st_plain.counts == 1).mean())
        frac_sm = float((st_sm.counts == 1).mean())
        assert frac_plain < 0.05, frac_plain  # documents the pathology
        assert frac_sm > 0.9, frac_sm  # the cure

    def test_cache_consistency_with_split_merge(self):
        """rate/loglik/logprior caches track the particle state exactly
        through thousands of split/merge applications."""
        from smcdet_tpu.inference.kernels import init_kernel_state

        ctx, state, move1 = _split_state_problem()
        sm = BirthDeathMH(
            num_iters=1,
            move=move1,
            prob_birth=0.15,
            prob_death=0.15,
            prob_split=0.1,
            prob_merge=0.1,
        )
        st = _advance(sm, ctx, state, jax.random.key(3), 2000)
        fresh = init_kernel_state(
            ctx, st.counts, st.inner.locs, st.inner.fluxes
        )
        np.testing.assert_allclose(
            np.asarray(st.inner.parent_ll),
            np.asarray(fresh.parent_ll),
            rtol=0,
            atol=0.5,
        )
        np.testing.assert_allclose(
            np.asarray(st.inner.logprior),
            np.asarray(fresh.logprior),
            rtol=0,
            atol=0.1,
        )
        assert float(jnp.abs(st.inner.rate - fresh.rate).max()) < 0.1

    def test_tdsmc_with_split_merge_recovers_truth(self):
        """Full TD-SMC with all five proposal kinds still lands on the
        two-star truth (posterior mode and total flux)."""
        image, prior, model, move = two_star_image()
        kernel = BirthDeathMH(
            num_iters=40,
            move=move.replace(num_iters=1, backend="xla"),
            prob_birth=0.15,
            prob_death=0.15,
            prob_split=0.1,
            prob_merge=0.1,
        )
        cfg = TDSMCConfig(
            num_particles=512,
            resample_method="systematic",
            max_smc_iters=60,
            flux_detection_threshold=200.0,
        )
        r = jax.block_until_ready(
            jax.jit(run_tdsmc)(
                jax.random.key(0), image[None], prior, model, kernel, cfg
            )
        )
        np.testing.assert_allclose(np.asarray(r.temperature), 1.0)
        counts = np.asarray(r.pruned_counts[0])
        vals, freq = np.unique(counts, return_counts=True)
        assert vals[freq.argmax()] == 2
        total = np.asarray(r.pruned_fluxes[0]).sum(-1)
        med = np.median(total[counts == 2])
        assert abs(med - 4100.0) / 4100.0 < 0.15, med
