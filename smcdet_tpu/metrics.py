"""Detection metrics: catalog matching + precision/recall/F1 (layer L4).

TPU-native re-design of /root/reference/smcdet/metrics.py:8-92. The
reference loops over tiles and sampled catalogs in python, calling scipy's
Hungarian solver per matrix; here the whole (tiles x sampled catalogs)
batch is matched in one jitted call using the on-device assignment solver
(ops/assignment.py), with magnitude bucketing as one-hot reductions.

Semantics parity with metrics.py:
- A (true, est) pair is matchable iff their location distance is within
  ``locs_tol`` AND their magnitude distance is within ``mags_tol`` (:48-57).
- Matching minimizes total location distance among matchable pairs
  (Hungarian with forbidden pairs at large cost, :59-60).
- Counts are bucketed by true/est magnitude via ``searchsorted`` into
  ``mag_bins``; values beyond the last bin edge are dropped (:67-77).
- ``num_est_catalogs_to_match`` posterior catalogs are sampled per tile;
  the reference samples uniformly from equally-weighted resampled output
  (:39); we sample with the posterior weights, which reduces to the same
  thing for uniform weights.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from smcdet_tpu.ops.assignment import BIG, linear_sum_assignment, pad_cost_matrix
from smcdet_tpu.ops.resampling import gather_particles, multinomial_indices
from smcdet_tpu.utils.units import convert_nmgy_to_mag

__all__ = ["MatchCounts", "match_catalogs", "compute_precision_recall_f1"]


class MatchCounts(NamedTuple):
    """Bucketed match counts ``[T, n_match, n_bins]`` (metrics.py:22-33)."""

    num_true_total: jax.Array
    num_true_matches: jax.Array
    num_est_total: jax.Array
    num_est_matches: jax.Array


def _bucket_onehot(mags, valid, mag_bins):
    """One-hot magnitude-bin membership ``[..., M, n_bins]`` for valid slots."""
    idx = jnp.searchsorted(mag_bins, mags, side="left")
    onehot = idx[..., None] == jnp.arange(mag_bins.shape[0])
    return onehot & valid[..., None]


def match_one(true_locs, true_mags, true_valid, est_locs, est_mags, est_valid,
              locs_tol, mags_tol):
    """Match one true catalog against one estimated catalog.

    Shapes: true ``[Mt, ...]``, est ``[Me, ...]``. Returns
    ``(true_matched [Mt] bool, est_matched [Me] bool)``.
    """
    locs_dist = jnp.linalg.norm(
        true_locs[:, None, :] - est_locs[None, :, :], axis=-1
    )  # [Mt, Me]
    mags_dist = jnp.abs(true_mags[:, None] - est_mags[None, :])
    feasible = (locs_dist <= locs_tol) & (mags_dist <= mags_tol)

    Mt, Me = locs_dist.shape
    n = max(Mt, Me)
    cost = jnp.where(feasible, locs_dist, BIG)
    square = jnp.full((n, n), BIG)
    square = square.at[:Mt, :Me].set(cost)
    # Slots beyond the catalog count are padding, exactly like the extra
    # rows/cols of the rectangular embedding.
    square = pad_cost_matrix(
        square,
        jnp.pad(true_valid, (0, n - Mt)),
        jnp.pad(est_valid, (0, n - Me)),
    )

    col4row = linear_sum_assignment(square)  # [n]
    rows = jnp.arange(n)
    rv = jnp.pad(true_valid, (0, n - Mt))
    cv = jnp.pad(est_valid, (0, n - Me))
    pair_ok = (
        rv
        & cv[col4row]
        & (col4row < Me)
        & (square[rows, col4row] < BIG)
    )
    true_matched = pair_ok[:Mt]
    est_matched = jnp.zeros((Me,), bool).at[
        jnp.clip(col4row[:Mt], 0, Me - 1)
    ].max(jnp.where(pair_ok[:Mt], True, False))
    return true_matched, est_matched


def match_catalogs(
    key,
    true_counts,
    true_locs,
    true_fluxes,
    est_counts,
    est_locs,
    est_fluxes,
    num_est_catalogs_to_match: int,
    locs_tol: float,
    mags_tol: float,
    mag_bins,
    est_weights=None,
) -> MatchCounts:
    """Batched catalog matching over ``T`` tiles.

    ``true_*``: ``[T](, Mt(, 2))``; ``est_*``: ``[T, N](, Me(, 2))`` — the
    flat posterior catalogs of an ``SMCResult``. ``est_weights`` ``[T, N]``
    selects which posterior catalogs get sampled (default uniform, the
    reference's randint over resampled catalogs, metrics.py:39).
    """
    mag_bins = jnp.asarray(mag_bins, dtype=jnp.float32)
    T, N = est_counts.shape[:2]
    Mt = true_locs.shape[-2]
    Me = est_locs.shape[-2]
    S = num_est_catalogs_to_match

    if est_weights is None:
        est_weights = jnp.full((T, N), 1.0 / N)
    idx = multinomial_indices(key, est_weights, S)  # [T, S]
    s_counts, s_locs, s_fluxes = gather_particles(
        idx, est_counts, est_locs, est_fluxes, particle_axis=1
    )

    true_valid = jnp.arange(Mt) < true_counts[:, None]  # [T, Mt]
    est_valid = jnp.arange(Me) < s_counts[..., None]  # [T, S, Me]

    safe_true = jnp.where(true_valid, true_fluxes, 1.0)
    safe_est = jnp.where(est_valid, s_fluxes, 1.0)
    true_mags = convert_nmgy_to_mag(safe_true)  # [T, Mt]
    est_mags = convert_nmgy_to_mag(safe_est)  # [T, S, Me]

    def per_catalog(tl, tm, tv, el, em, ev):
        return match_one(tl, tm, tv, el, em, ev, locs_tol, mags_tol)

    # vmap over sampled catalogs then tiles.
    f = jax.vmap(per_catalog, in_axes=(None, None, None, 0, 0, 0))
    f = jax.vmap(f, in_axes=(0, 0, 0, 0, 0, 0))
    true_matched, est_matched = f(
        true_locs, true_mags, true_valid, s_locs, est_mags, est_valid
    )  # [T, S, Mt], [T, S, Me]

    true_onehot = _bucket_onehot(true_mags, true_valid, mag_bins)  # [T,Mt,B]
    est_onehot = _bucket_onehot(est_mags, est_valid, mag_bins)  # [T,S,Me,B]

    n_true_total = jnp.broadcast_to(
        true_onehot.sum(-2)[:, None, :], (T, S, mag_bins.shape[0])
    ).astype(jnp.float32)
    n_true_match = (
        (true_onehot[:, None] * true_matched[..., None]).sum(-2)
    ).astype(jnp.float32)
    n_est_total = est_onehot.sum(-2).astype(jnp.float32)
    n_est_match = (
        (est_onehot * est_matched[..., None]).sum(-2)
    ).astype(jnp.float32)

    return MatchCounts(n_true_total, n_true_match, n_est_total, n_est_match)


def compute_precision_recall_f1(counts: MatchCounts):
    """Precision/recall/F1 per (sampled catalog, magnitude bin).

    Parity: metrics.py:87-92 — sums run over tiles (axis 0) only, leaving a
    ``[n_match, n_bins]`` grid whose catalog axis downstream analyses
    bootstrap over; nan -> 0.
    """
    precision = jnp.nan_to_num(
        counts.num_est_matches.sum(0) / counts.num_est_total.sum(0)
    )
    recall = jnp.nan_to_num(
        counts.num_true_matches.sum(0) / counts.num_true_total.sum(0)
    )
    f1 = jnp.nan_to_num(2 * precision * recall / (precision + recall))
    return precision, recall, f1
