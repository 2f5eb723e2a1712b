"""Batched linear-sum assignment (Hungarian / Jonker-Volgenant), on device.

The reference's catalog matching calls ``scipy.optimize.linear_sum_assignment``
once per (tile, sampled catalog) inside a double python loop
(/root/reference/smcdet/metrics.py:35-60) — a host round-trip per matrix.
Here the shortest-augmenting-path algorithm (the same one scipy implements)
is expressed with ``lax`` control flow over fixed-shape masks, so it jits,
``vmap``s over the (tiles x catalogs) batch, and runs on the TPU next to
the sampler output it scores.

Matrices are square ``n x n`` (pad rectangular problems; see
``pad_cost_matrix``). ``n`` is tiny for this workload (max objects per tile
~10), so the O(n^3) scalar-ish loops are negligible next to the batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["linear_sum_assignment", "pad_cost_matrix"]

# Forbidden/padding cost. Large enough to never beat a real pairing, small
# enough that sums of n of them stay finite in float32.
BIG = jnp.float32(1e9)


def _augment(cost, u, v, col4row, row4col, cur_row):
    """One row augmentation of the shortest-augmenting-path algorithm."""
    n = cost.shape[0]
    inf = jnp.float32(jnp.inf)

    shortest = jnp.full((n,), inf)
    path = jnp.full((n,), -1, jnp.int32)
    scanned_cols = jnp.zeros((n,), bool)
    scanned_rows = jnp.zeros((n,), bool)

    def cond(state):
        return state[6] < 0

    def body(state):
        shortest, path, scanned_rows, scanned_cols, min_val, i, sink = state
        scanned_rows = scanned_rows.at[i].set(True)
        reduced = min_val + cost[i] - u[i] - v
        better = (reduced < shortest) & ~scanned_cols
        shortest = jnp.where(better, reduced, shortest)
        path = jnp.where(better, i, path)

        masked = jnp.where(scanned_cols, inf, shortest)
        lowest = masked.min()
        is_min = masked == lowest
        # Prefer an unassigned column among the minima (terminates sooner;
        # matches scipy's tie-break).
        unassigned_min = is_min & (row4col == -1)
        j = jnp.where(
            unassigned_min.any(), jnp.argmax(unassigned_min), jnp.argmax(is_min)
        ).astype(jnp.int32)
        scanned_cols = scanned_cols.at[j].set(True)
        sink = jnp.where(row4col[j] == -1, j, jnp.int32(-1))
        i = jnp.where(row4col[j] == -1, i, row4col[j])
        return (shortest, path, scanned_rows, scanned_cols, lowest, i, sink)

    init = (
        shortest,
        path,
        scanned_rows,
        scanned_cols,
        jnp.float32(0.0),
        cur_row,
        jnp.int32(-1),
    )
    shortest, path, scanned_rows, scanned_cols, min_val, _, sink = (
        lax.while_loop(cond, body, init)
    )

    # Dual updates.
    rows_idx = jnp.arange(n)
    u = u.at[cur_row].add(min_val)
    other_rows = scanned_rows & (rows_idx != cur_row)
    # shortest path cost at the column currently assigned to each row
    spc_at_assigned = jnp.where(
        col4row >= 0, shortest[jnp.clip(col4row, 0)], 0.0
    )
    u = u + jnp.where(other_rows, min_val - spc_at_assigned, 0.0)
    v = v + jnp.where(scanned_cols, -(min_val - shortest), 0.0)

    # Augment along the alternating path ending at `sink`.
    def aug_cond(state):
        return ~state[3]

    def aug_body(state):
        col4row, row4col, j, done = state
        i = path[j]
        row4col = row4col.at[j].set(i)
        next_j = col4row[i]
        col4row = col4row.at[i].set(j)
        return (col4row, row4col, next_j, i == cur_row)

    col4row, row4col, _, _ = lax.while_loop(
        aug_cond, aug_body, (col4row, row4col, sink, False)
    )
    return u, v, col4row, row4col


def _solve_one(cost):
    """col4row [n]: the column assigned to each row (square cost matrix)."""
    n = cost.shape[0]
    u = jnp.zeros((n,))
    v = jnp.zeros((n,))
    col4row = jnp.full((n,), -1, jnp.int32)
    row4col = jnp.full((n,), -1, jnp.int32)

    def step(carry, cur_row):
        u, v, col4row, row4col = carry
        u, v, col4row, row4col = _augment(
            cost, u, v, col4row, row4col, cur_row
        )
        return (u, v, col4row, row4col), None

    (u, v, col4row, row4col), _ = lax.scan(
        step, (u, v, col4row, row4col), jnp.arange(n, dtype=jnp.int32)
    )
    return col4row


def linear_sum_assignment(cost):
    """Minimum-cost perfect matching of square cost matrices.

    ``cost``: ``[..., n, n]`` → ``col4row`` ``[..., n]`` int32: column
    assigned to each row. Batched over all leading axes.
    """
    cost = jnp.asarray(cost, dtype=jnp.float32)
    batch = cost.shape[:-2]
    n = cost.shape[-1]
    flat = cost.reshape((-1, n, n))
    out = jax.vmap(_solve_one)(flat)
    return out.reshape(batch + (n,))


def pad_cost_matrix(cost, row_valid, col_valid, big=BIG):
    """Embed a masked rectangular problem into a square one.

    Entries where either end is invalid (padding slot) cost ``big`` except
    (pad, pad) pairs, which cost 0 so padding absorbs padding. An optimal
    square assignment then (1) never sacrifices a feasible real pairing and
    (2) marks infeasible/padded matches with cost >= big for the caller to
    discard — the same semantics as the reference's ``oob * 1e20`` trick
    (metrics.py:57-62).
    """
    rv = row_valid[..., :, None]
    cv = col_valid[..., None, :]
    both = rv & cv
    neither = ~rv & ~cv
    return jnp.where(both, cost, jnp.where(neither, 0.0, big))
