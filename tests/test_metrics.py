import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcdet_tpu.metrics import (
    compute_precision_recall_f1,
    match_catalogs,
    match_one,
)
from smcdet_tpu.ops.assignment import linear_sum_assignment, pad_cost_matrix
from smcdet_tpu.utils.units import convert_mag_to_nmgy, convert_nmgy_to_mag


@pytest.mark.slow
class TestAssignment:
    def test_matches_scipy_on_random_matrices(self):
        from scipy.optimize import linear_sum_assignment as ref_lsa

        rng = np.random.default_rng(0)
        for _ in range(50):
            n = int(rng.integers(1, 11))
            c = rng.uniform(0, 10, (n, n)).astype(np.float32)
            ours = np.asarray(linear_sum_assignment(jnp.asarray(c)))
            r, col = ref_lsa(c)
            np.testing.assert_allclose(
                c[np.arange(n), ours].sum(), c[r, col].sum(), rtol=1e-5
            )

    def test_batched(self):
        from scipy.optimize import linear_sum_assignment as ref_lsa

        rng = np.random.default_rng(1)
        c = rng.uniform(0, 10, (4, 3, 5, 5)).astype(np.float32)
        out = np.asarray(linear_sum_assignment(jnp.asarray(c)))
        assert out.shape == (4, 3, 5)
        for i in range(4):
            for j in range(3):
                r, col = ref_lsa(c[i, j])
                np.testing.assert_allclose(
                    c[i, j][np.arange(5), out[i, j]].sum(),
                    c[i, j][r, col].sum(),
                    rtol=1e-5,
                )

    def test_pad_cost_matrix(self):
        cost = jnp.ones((3, 3))
        rv = jnp.asarray([True, True, False])
        cv = jnp.asarray([True, False, False])
        sq = np.asarray(pad_cost_matrix(cost, rv, cv))
        assert sq[0, 0] == 1.0 and sq[1, 0] == 1.0
        assert sq[0, 1] > 1e8 and sq[2, 0] > 1e8
        assert sq[2, 1] == 0.0 and sq[2, 2] == 0.0


class TestUnits:
    def test_roundtrip(self):
        f = jnp.asarray([0.5, 10.0, 1804.0])
        np.testing.assert_allclose(
            np.asarray(convert_mag_to_nmgy(convert_nmgy_to_mag(f))),
            np.asarray(f),
            rtol=1e-5,
        )


class TestMatchOne:
    def test_perfect_match(self):
        locs = jnp.asarray([[2.0, 2.0], [5.0, 5.0]])
        mags = jnp.asarray([20.0, 21.0])
        valid = jnp.asarray([True, True])
        tm, em = match_one(locs, mags, valid, locs, mags, valid, 0.5, 0.5)
        assert np.asarray(tm).all() and np.asarray(em).all()

    def test_distance_gate(self):
        t_locs = jnp.asarray([[2.0, 2.0]])
        e_locs = jnp.asarray([[2.0, 3.0]])  # 1 px away > tol
        mags = jnp.asarray([20.0])
        valid = jnp.asarray([True])
        tm, em = match_one(t_locs, mags, valid, e_locs, mags, valid, 0.5, 0.5)
        assert not np.asarray(tm).any() and not np.asarray(em).any()

    def test_magnitude_gate(self):
        locs = jnp.asarray([[2.0, 2.0]])
        valid = jnp.asarray([True])
        tm, em = match_one(
            locs,
            jnp.asarray([20.0]),
            valid,
            locs,
            jnp.asarray([21.0]),
            valid,
            0.5,
            0.5,
        )
        assert not np.asarray(tm).any()

    def test_prefers_closer_of_two(self):
        t_locs = jnp.asarray([[2.0, 2.0]])
        t_mags = jnp.asarray([20.0])
        e_locs = jnp.asarray([[2.0, 2.3], [2.0, 2.1]])
        e_mags = jnp.asarray([20.0, 20.0])
        tm, em = match_one(
            t_locs,
            t_mags,
            jnp.asarray([True]),
            e_locs,
            e_mags,
            jnp.asarray([True, True]),
            0.5,
            0.5,
        )
        em = np.asarray(em)
        assert em[1] and not em[0]

    def test_padding_slots_never_match(self):
        locs = jnp.asarray([[2.0, 2.0], [0.0, 0.0]])
        mags = jnp.asarray([20.0, 20.0])
        tm, em = match_one(
            locs,
            mags,
            jnp.asarray([True, False]),
            locs,
            mags,
            jnp.asarray([True, False]),
            0.5,
            0.5,
        )
        assert np.asarray(tm).tolist() == [True, False]
        assert np.asarray(em).tolist() == [True, False]


class TestMatchCatalogs:
    def _toy_problem(self):
        # 2 tiles; tile 0 has 2 true stars, tile 1 has 1.
        true_counts = jnp.asarray([2, 1])
        true_locs = jnp.asarray(
            [[[2.0, 2.0], [5.0, 5.0]], [[4.0, 4.0], [0.0, 0.0]]]
        )
        true_fluxes = jnp.asarray([[100.0, 50.0], [200.0, 0.0]])
        # 3 posterior catalogs per tile, all identical to truth except one
        # catalog in tile 0 misses the second star.
        est_counts = jnp.asarray([[2, 1, 2], [1, 1, 1]])
        est_locs = jnp.asarray(
            [
                [
                    [[2.1, 2.0], [5.0, 5.1]],
                    [[2.0, 2.0], [0.0, 0.0]],
                    [[2.0, 1.9], [5.1, 5.0]],
                ],
                [
                    [[4.0, 4.1], [0.0, 0.0]],
                    [[4.1, 4.0], [0.0, 0.0]],
                    [[4.0, 3.9], [0.0, 0.0]],
                ],
            ]
        )
        est_fluxes = jnp.asarray(
            [
                [[100.0, 50.0], [100.0, 0.0], [100.0, 50.0]],
                [[200.0, 0.0], [200.0, 0.0], [200.0, 0.0]],
            ]
        )
        return true_counts, true_locs, true_fluxes, est_counts, est_locs, est_fluxes

    def test_counts_and_f1(self):
        tc, tl, tf, ec, el, ef = self._toy_problem()
        mag_bins = jnp.asarray([15.0, 18.0, 21.0, 24.0])
        counts = match_catalogs(
            jax.random.key(0),
            tc,
            tl,
            tf,
            ec,
            el,
            ef,
            num_est_catalogs_to_match=8,
            locs_tol=0.5,
            mags_tol=0.5,
            mag_bins=mag_bins,
        )
        assert counts.num_true_total.shape == (2, 8, 4)
        # Every sampled catalog matches at least its bright star.
        assert (np.asarray(counts.num_est_matches).sum(-1) >= 1).all()
        p, r, f1 = compute_precision_recall_f1(counts)
        assert p.shape == (8, 4)
        # All estimated sources are correct => precision 1 in occupied bins.
        occupied = np.asarray(counts.num_est_total.sum(0)) > 0
        np.testing.assert_allclose(np.asarray(p)[occupied], 1.0)

    def test_parity_with_reference(self):
        from reference_harness import load_reference

        smcdet = load_reference()
        import importlib

        import torch

        ref_metrics = importlib.import_module("smcdet.metrics")

        tc, tl, tf, ec, el, ef = self._toy_problem()
        mag_bins = [15.0, 18.0, 21.0, 24.0]
        S = 6
        ours = match_catalogs(
            jax.random.key(0),
            tc,
            tl,
            tf,
            ec,
            el,
            ef,
            num_est_catalogs_to_match=S,
            locs_tol=0.5,
            mags_tol=0.5,
            mag_bins=jnp.asarray(mag_bins),
        )
        torch.manual_seed(0)
        ref = ref_metrics.match_catalogs(
            torch.tensor(np.asarray(tc, dtype=np.float32)),
            torch.tensor(np.asarray(tl)),
            torch.tensor(np.asarray(tf)),
            torch.tensor(np.asarray(ec, dtype=np.float32)),
            torch.tensor(np.asarray(el)),
            torch.tensor(np.asarray(ef)),
            S,
            0.5,
            0.5,
            torch.tensor(mag_bins),
        )
        # Different RNGs sample different catalogs, so compare per-tile
        # AVERAGES over sampled catalogs (every catalog is near-identical
        # in this toy problem, so averages agree exactly).
        for ours_arr, ref_arr in zip(ours, ref):
            np.testing.assert_allclose(
                np.asarray(ours_arr).mean(1),
                ref_arr.numpy().mean(1),
                atol=0.5,
            )
