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
