"""Adaptive likelihood tempering, fully on-device.

The reference solves the ESS-matching equation per tile with
``scipy.optimize.brentq`` on the CPU inside a python double loop
(sampler.py:99-125) — a host sync every SMC iteration. Here the same root
find is a fixed-iteration bisection, vectorised over every batch axis
(tiles, count strata) and differentiably jittable, so the whole SMC loop
stays on device.

Objective (sampler.py:93-97): find the largest step ``delta`` with

    ESS(delta) = (sum_i w_i^delta)^2 / sum_i w_i^(2 delta) >= ess_target,
    w_i = exp(loglik_i),  delta in [0, 1 - temperature].

ESS(delta) is monotonically non-increasing in delta for the typical case,
so if ``ESS(1 - t) >= target`` the full remaining step is taken
(sampler.py:113-122); otherwise we bisect.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import logsumexp

__all__ = ["ess_at_delta", "solve_tempering_step"]


def ess_at_delta(loglik, delta):
    """Effective sample size of incremental weights ``delta * loglik``.

    ``loglik``: ``[..., N]``; ``delta``: ``[...]`` → ``[...]``.
    """
    d = delta[..., None]
    log_num = 2.0 * logsumexp(d * loglik, axis=-1)
    log_den = logsumexp(2.0 * d * loglik, axis=-1)
    return jnp.exp(log_num - log_den)


def solve_tempering_step(loglik, temperature, ess_target, num_iters: int = 40):
    """Batched bisection for the adaptive tempering step.

    ``loglik``: ``[..., N]``, ``temperature``: ``[...]`` broadcastable,
    ``ess_target``: scalar or ``[...]``. Returns ``delta`` with the same
    batch shape; ``num_iters=40`` gives ~1e-12 interval width, far tighter
    than the reference's brentq ``xtol=1e-6``.
    """
    loglik = jnp.nan_to_num(loglik, neginf=-1e30)
    remaining = jnp.clip(1.0 - temperature, 0.0, 1.0)
    full_step_ok = ess_at_delta(loglik, remaining) >= ess_target

    lo = jnp.zeros_like(remaining)
    hi = remaining
    for _ in range(num_iters):
        mid = 0.5 * (lo + hi)
        too_degenerate = ess_at_delta(loglik, mid) < ess_target
        hi = jnp.where(too_degenerate, mid, hi)
        lo = jnp.where(too_degenerate, lo, mid)
    bisected = 0.5 * (lo + hi)

    return jnp.where(full_step_ok, remaining, bisected)
