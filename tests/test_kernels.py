"""Unit tests for the single-component kernel's slot-selection scheme.

The kernels propose over the OCCUPIED slot prefix (slots 0..count-1)
rather than all ``max_objects`` padded slots (the reference proposes over
every slot, kernel.py:35-44, wasting (M-s)/M of each sweep). These tests
pin the selection contract the exactness argument rests on: only occupied
slots are ever mutated, at most one slot per catalog per sweep, and the
selection is uniform over the occupied prefix.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _tiny_problem():
    from smcdet_tpu.inference.kernels import TargetContext, init_kernel_state
    from smcdet_tpu.models.imaging import ImageModel
    from smcdet_tpu.models.priors import (
        NormalFlux,
        PointProcessPrior,
        UniformCounts,
    )
    from smcdet_tpu.models.psf import GaussianPSF

    M = 4
    prior = PointProcessPrior(
        min_objects=0,
        max_objects=M,
        image_height=8,
        image_width=8,
        pad=1.0,
        counts=UniformCounts(0, M),
        flux=NormalFlux(mean=jnp.float32(500.0), stdev=jnp.float32(100.0)),
    )
    model = ImageModel(
        height=8,
        width=8,
        psf_radius=4,
        noise="poisson",
        background=jnp.float32(100.0),
        psf=GaussianPSF(stdev=jnp.float32(1.0)),
    )
    # one batch row, four catalogs with counts 0, 1, 2, 4
    counts = jnp.asarray([[0, 1, 2, 4]], dtype=jnp.int32)
    locs = jnp.tile(
        jnp.asarray(
            [[[1.5, 1.5], [5.5, 2.5], [2.5, 5.5], [6.0, 6.0]]],
            dtype=jnp.float32,
        ),
        (1, 4, 1, 1),
    ).reshape(1, 4, 4, 2)
    fluxes = jnp.tile(
        jnp.asarray([480.0, 510.0, 495.0, 505.0], dtype=jnp.float32),
        (1, 4, 1),
    ).reshape(1, 4, 4)
    # zero out the padding slots (slot >= count) as the prior/SMC invariant
    slot = jnp.arange(4)
    occ = slot[None, None, :] < counts[..., None]
    locs = jnp.where(occ[..., None], locs, 0.0)
    fluxes = jnp.where(occ, fluxes, 0.0)
    image = model.sample(jax.random.key(9), locs[0, 3], fluxes[0, 3])
    ctx = TargetContext(
        prior=prior,
        model=model,
        image=image[None, None],
        temperature=jnp.ones((1, 4)),
    )
    state = init_kernel_state(ctx, counts, locs, fluxes)
    return ctx, counts, locs, fluxes, state, occ


class TestOccupiedPrefixSelection:
    def test_selection_uniform_over_occupied_prefix(self):
        from smcdet_tpu.inference.kernels import SingleComponentMH

        ctx, counts, locs, fluxes, state, occ = _tiny_problem()
        # near-zero proposal steps: acceptance ~ 1, so the mutated-slot
        # frequencies measure the selection distribution directly
        kernel = SingleComponentMH(
            num_iters=1,
            locs_stdev=jnp.float32(1e-5),
            fluxes_stdev=jnp.float32(1e-3),
            fluxes_min=jnp.float32(0.0),
            fluxes_max=jnp.float32(1e6),
        )
        K = 512
        keys = jax.random.split(jax.random.key(0), K)

        @jax.jit
        def one_sweep(k):
            new_state, applied = kernel.sweep(k, ctx, counts, state)
            return new_state.fluxes, applied

        f2, applied = jax.vmap(one_sweep)(keys)  # [K, 1, 4, M]
        changed = np.asarray(f2 != fluxes[None])  # [K, 1, 4, M]
        occ = np.asarray(occ)  # [1, 4, M]

        # 1. padding slots (slot >= count) are never touched
        assert not changed[:, ~occ].any()
        # 2. at most one slot changes per catalog per sweep
        assert (changed.sum(-1) <= 1).all()
        # 3. the count-0 catalog never changes and reports no applied move
        assert not changed[:, 0, 0].any()
        assert not np.asarray(applied)[:, 0, 0].any()
        # 4. acceptance at epsilon step size is ~1, so per-slot mutation
        #    frequency estimates the selection probability 1/count
        freq = changed.mean(0)  # [1, 4, M]
        for n, c in enumerate([0, 1, 2, 4]):
            if c == 0:
                continue
            expect = 1.0 / c
            got = freq[0, n, :c]
            # binomial SE at K=512 is <= 0.022; accept 5 sigma
            np.testing.assert_allclose(got, expect, atol=0.11)

    def test_high_count_catalog_mixes_every_slot(self):
        """With prefix selection every occupied slot of a full catalog is
        proposed ~num_iters/count times; over a short run all four slots
        of the count-4 catalog must actually move."""
        from smcdet_tpu.inference.kernels import SingleComponentMH

        ctx, counts, locs, fluxes, state, occ = _tiny_problem()
        kernel = SingleComponentMH(
            num_iters=64,
            locs_stdev=jnp.float32(0.05),
            fluxes_stdev=jnp.float32(2.0),
            fluxes_min=jnp.float32(0.0),
            fluxes_max=jnp.float32(1e6),
            backend="xla",
        )
        new_state, acc = jax.jit(kernel.run_from_state)(
            jax.random.key(1), ctx, counts, state
        )
        changed = np.asarray(new_state.fluxes != fluxes)
        occ = np.asarray(occ)
        assert changed[0, 3].all()  # count-4 catalog: all slots moved
        assert not changed[~occ].any()  # padding untouched


class TestSqJumpDistEarlyStop:
    """jsm2024 parity knob (reference normalfluxes_tiles_32x32/
    run_smc_mh.py:57-73): ``sqjumpdist_tol`` stops the sweep loop once
    the batch-mean squared location jump per sweep falls below the
    tolerance, capped at ``num_iters``."""

    def test_tol_zero_runs_all_sweeps_bitwise(self):
        """tol=0 can only stop at the iteration cap, and the while_loop
        path must equal a hand-rolled fold_in sweep loop bitwise."""
        from smcdet_tpu.inference.kernels import SingleComponentMH

        ctx, counts, locs, fluxes, state, occ = _tiny_problem()
        kernel = SingleComponentMH(
            num_iters=7,
            locs_stdev=jnp.float32(0.25),
            fluxes_stdev=jnp.float32(40.0),
            fluxes_min=jnp.float32(100.0),
            fluxes_max=jnp.float32(900.0),
            backend="xla",
            sqjumpdist_tol=0.0,
        )
        key = jax.random.key(3)
        got, acc = jax.jit(
            lambda k: kernel.run_from_state(k, ctx, counts, state)
        )(key)

        st = state
        acc_n = jnp.zeros(counts.shape, dtype=jnp.float32)
        for i in range(kernel.num_iters):
            st, applied = kernel.sweep(
                jax.random.fold_in(key, i), ctx, counts, st
            )
            acc_n = acc_n + applied.astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(got.locs), np.asarray(st.locs))
        np.testing.assert_array_equal(
            np.asarray(got.fluxes), np.asarray(st.fluxes)
        )
        np.testing.assert_allclose(
            np.asarray(acc),
            np.asarray((acc_n / kernel.num_iters).mean(-1)),
            rtol=1e-6,
        )

    def test_huge_tol_stops_after_one_sweep(self):
        from smcdet_tpu.inference.kernels import SingleComponentMH

        ctx, counts, locs, fluxes, state, occ = _tiny_problem()
        base = dict(
            locs_stdev=jnp.float32(0.25),
            fluxes_stdev=jnp.float32(40.0),
            fluxes_min=jnp.float32(100.0),
            fluxes_max=jnp.float32(900.0),
            backend="xla",
        )
        key = jax.random.key(3)
        early = SingleComponentMH(
            num_iters=50, sqjumpdist_tol=1e9, **base
        ).run_from_state(key, ctx, counts, state)
        one = SingleComponentMH(num_iters=1, **base)
        st1, _ = one.sweep(jax.random.fold_in(key, 0), ctx, counts, state)
        np.testing.assert_array_equal(
            np.asarray(early[0].locs), np.asarray(st1.locs)
        )
        np.testing.assert_array_equal(
            np.asarray(early[0].fluxes), np.asarray(st1.fluxes)
        )

    def test_converged_chain_stops_before_cap(self):
        """A near-zero MALA step moves ~1e-8 px^2 per sweep, so a 1e-4
        tolerance must stop the while_loop at the very first sweep whose
        jump is measured. Pinned deterministically: the stopped state
        must be BIT-identical to a single fixed sweep (both paths use
        ``fold_in(key, 0)``), so a regression to running all 200 sweeps
        changes the state bits — no wall-clock smoke needed."""
        from smcdet_tpu.inference.kernels import SingleComponentMALA

        ctx, counts, locs, fluxes, state, occ = _tiny_problem()
        base = dict(
            locs_step=jnp.float32(1e-4),
            fluxes_step=jnp.float32(1e-3),
            fluxes_min=jnp.float32(100.0),
            fluxes_max=jnp.float32(900.0),
            backend="xla",
        )
        key = jax.random.key(4)
        st, acc = SingleComponentMALA(
            num_iters=200, sqjumpdist_tol=1e-4, **base
        ).run_from_state(key, ctx, counts, state)
        st1, _ = SingleComponentMALA(num_iters=1, **base).sweep(
            jax.random.fold_in(key, 0), ctx, counts, state
        )
        np.testing.assert_array_equal(np.asarray(st.locs), np.asarray(st1.locs))
        np.testing.assert_array_equal(
            np.asarray(st.fluxes), np.asarray(st1.fluxes)
        )
        # acceptance is normalized by the EXECUTED sweep count (1), so
        # tiny steps give a well-defined high rate
        assert float(acc.mean()) > 0.5
