"""Transdimensional SMC: birth/death moves over the object count.

CS-SMC (inference/smc.py) handles the unknown object count by running one
sampler per count stratum (manuscript.tex:312-380). This module provides
the classic alternative — a single likelihood-tempered SMC population
whose particles move across counts via reversible-jump birth/death
proposals (BASELINE.json configs[2]) — useful when the count range is too
large to stratify densely, and as an independent cross-check of the
stratified posterior.

``BirthDeathMH`` alternates three proposal types per sweep, chosen
independently per particle:

- move: the single-component truncated-normal update of
  ``SingleComponentMH``;
- birth (count -> count + 1): a new star drawn from the prior marks; the
  proposal density cancels the prior terms, so the acceptance ratio is
  ``p_count(n+1)/p_count(n) * L(new)/L(old) * P_death/(P_birth) *
  (n+1 slots bookkeeping)``;
- death (count -> count - 1): remove a uniformly chosen active star
  (the reverse of birth).

With prior-draw births and uniform-choice deaths the Jacobian is 1 and
the mark densities cancel, leaving the count-prior ratio, the tempered
likelihood ratio, and the ``P_b/P_d * 1/(n+1)``-style correction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from smcdet_tpu.inference.kernels import (
    KernelState,
    SingleComponentMH,
    TargetContext,
    init_kernel_state,
)
from smcdet_tpu.ops.catalogs import prune_catalog, slot_mask
from smcdet_tpu.ops.resampling import gather_particles, resample_indices
from smcdet_tpu.ops.tempering import solve_tempering_step

__all__ = ["BirthDeathMH", "TDSMCConfig", "TDSMCResult", "run_tdsmc"]


class TDKernelState(NamedTuple):
    counts: jax.Array  # [..., N] i32 — mutable here, unlike KernelState
    inner: KernelState


@struct.dataclass
class BirthDeathMH:
    """Reversible-jump birth/death + single-component move kernel."""

    num_iters: int = struct.field(pytree_node=False)
    move: SingleComponentMH = None
    prob_birth: float = 0.2
    prob_death: float = 0.2

    def _count_log_pmf(self, prior, counts):
        return prior.counts.log_prob(counts)

    def _sweep(self, key, ctx: TargetContext, state: TDKernelState):
        prior, model = ctx.prior, ctx.model
        counts, inner = state.counts, state.inner
        locs, fluxes = inner.locs, inner.fluxes
        batchN = counts.shape
        M = fluxes.shape[-1]
        (
            k_kind,
            k_move,
            k_birth_loc,
            k_birth_flux,
            k_death,
            k_acc,
        ) = jax.random.split(key, 6)

        u_kind = jax.random.uniform(k_kind, batchN)
        do_birth = u_kind < self.prob_birth
        do_death = (u_kind >= self.prob_birth) & (
            u_kind < self.prob_birth + self.prob_death
        )

        # ------------------------- move -------------------------------
        moved, move_applied = self.move.sweep(k_move, ctx, counts, inner)

        # ------------------------- birth ------------------------------
        new_loc = prior.loc_low + (
            prior.loc_high - prior.loc_low
        ) * jax.random.uniform(k_birth_loc, batchN + (2,))
        new_flux = (
            prior.flux.sample(k_birth_flux, batchN)
            if prior.flux is not None
            else jnp.zeros(batchN)
        )
        can_birth = counts < M
        # the new star goes into slot `counts` (first inactive slot)
        slot_b = jnp.minimum(counts, M - 1)
        onehot_b = jnp.arange(M) == slot_b[..., None]
        eff = jnp.asarray(model.adu_per_nmgy)
        birth_img, _ = ctx.star_images(new_loc)
        rate_b = inner.rate + jnp.where(
            can_birth[..., None],
            eff * new_flux[..., None] * birth_img,
            0.0,
        )
        ll_b, _ = ctx.loglik_terms(rate_b, None)
        # prior terms: count pmf changes; the new star's loc/flux terms are
        # added to logprior but cancel against the proposal density except
        # for nothing (prior-draw birth) — only the count pmf ratio and
        # the area term remain in logprior bookkeeping, so track exactly:
        lp_delta_b = (
            self._count_log_pmf(prior, counts + 1)
            - self._count_log_pmf(prior, counts)
            - jnp.log(prior.loc_high - prior.loc_low).sum()
            + (
                prior.flux.log_prob(new_flux)
                if prior.flux is not None
                else 0.0
            )
        )
        lp_b = inner.logprior + lp_delta_b
        # proposal: q_birth = P_b * prior(mark); reverse q = P_d * 1/(n+1)
        log_q_fwd_b = jnp.log(self.prob_birth) + (
            (
                prior.flux.log_prob(new_flux)
                if prior.flux is not None
                else 0.0
            )
            - jnp.log(prior.loc_high - prior.loc_low).sum()
        )
        log_q_rev_b = jnp.log(self.prob_death) - jnp.log(
            (counts + 1).astype(jnp.float32)
        )
        la_birth = (
            ctx.combine(lp_b, ll_b, None)
            - ctx.combine(inner.logprior, inner.parent_ll, None)
            + log_q_rev_b
            - log_q_fwd_b
        )

        # ------------------------- death ------------------------------
        can_death = counts > prior.min_objects
        u_pick = jax.random.uniform(k_death, batchN)
        pick = jnp.minimum(
            jnp.floor(u_pick * counts.astype(jnp.float32)).astype(jnp.int32),
            jnp.maximum(counts - 1, 0),
        )
        onehot_d = jnp.arange(M) == pick[..., None]
        dead_loc = (locs * onehot_d[..., None]).sum(-2)
        dead_flux = (fluxes * onehot_d).sum(-1)
        dead_img, _ = ctx.star_images(dead_loc)
        rate_d = inner.rate - jnp.where(
            can_death[..., None],
            eff * dead_flux[..., None] * dead_img,
            0.0,
        )
        ll_d, _ = ctx.loglik_terms(rate_d, None)
        safe_dead = jnp.where(
            can_death & (dead_flux > 0), dead_flux,
            prior.flux.reference_point if prior.flux is not None else 1.0,
        )
        lp_delta_d = (
            self._count_log_pmf(prior, jnp.maximum(counts - 1, 0))
            - self._count_log_pmf(prior, counts)
            + jnp.log(prior.loc_high - prior.loc_low).sum()
            - (
                prior.flux.log_prob(safe_dead)
                if prior.flux is not None
                else 0.0
            )
        )
        lp_d = inner.logprior + lp_delta_d
        log_q_fwd_d = jnp.log(self.prob_death) - jnp.log(
            jnp.maximum(counts, 1).astype(jnp.float32)
        )
        log_q_rev_d = jnp.log(self.prob_birth) + (
            (
                prior.flux.log_prob(safe_dead)
                if prior.flux is not None
                else 0.0
            )
            - jnp.log(prior.loc_high - prior.loc_low).sum()
        )
        la_death = (
            ctx.combine(lp_d, ll_d, None)
            - ctx.combine(inner.logprior, inner.parent_ll, None)
            + log_q_rev_d
            - log_q_fwd_d
        )

        # ------------------------- select + accept --------------------
        u = jax.random.uniform(k_acc, batchN)
        acc_birth = (
            do_birth & can_birth & (u <= jnp.exp(jnp.minimum(la_birth, 0.0)))
        )
        acc_death = (
            do_death & can_death & (u <= jnp.exp(jnp.minimum(la_death, 0.0)))
        )

        # apply birth — on top of the ORIGINAL arrays, not the move sweep's
        # output: a birth/death particle did not take the move branch, and
        # its rate/logprior deltas (rate_b/rate_d, lp_b/lp_d) are relative
        # to ``inner``. Basing the state on ``moved.*`` here would bake the
        # move into the state while the caches never see it, so the cached
        # rate/loglik/logprior drift linearly off the actual particle state
        # over a long chain.
        locs1 = jnp.where(
            (onehot_b & acc_birth[..., None])[..., None],
            new_loc[..., None, :],
            locs,
        )
        fluxes1 = jnp.where(
            onehot_b & acc_birth[..., None], new_flux[..., None], fluxes
        )
        # apply death: compact by moving the last active star into the gap
        last_slot = jnp.maximum(counts - 1, 0)
        onehot_last = jnp.arange(M) == last_slot[..., None]
        last_loc = (locs * onehot_last[..., None]).sum(-2)
        last_flux = (fluxes * onehot_last).sum(-1)
        locs2 = jnp.where(
            (onehot_d & acc_death[..., None])[..., None],
            last_loc[..., None, :],
            locs1,
        )
        locs2 = jnp.where(
            (onehot_last & acc_death[..., None])[..., None], 0.0, locs2
        )
        fluxes2 = jnp.where(
            onehot_d & acc_death[..., None], last_flux[..., None], fluxes1
        )
        fluxes2 = jnp.where(onehot_last & acc_death[..., None], 0.0, fluxes2)

        is_move = ~(do_birth | do_death)
        sel_move = is_move[..., None]
        locs_out = jnp.where(sel_move[..., None], moved.locs, locs2)
        fluxes_out = jnp.where(sel_move, moved.fluxes, fluxes2)

        counts_out = (
            counts
            + acc_birth.astype(jnp.int32)
            - acc_death.astype(jnp.int32)
        )

        rate_out = jnp.where(
            is_move[..., None],
            moved.rate,
            jnp.where(
                acc_birth[..., None],
                rate_b,
                jnp.where(acc_death[..., None], rate_d, inner.rate),
            ),
        )
        pll_out = jnp.where(
            is_move,
            moved.parent_ll,
            jnp.where(acc_birth, ll_b, jnp.where(acc_death, ll_d, inner.parent_ll)),
        )
        lp_out = jnp.where(
            is_move,
            moved.logprior,
            jnp.where(acc_birth, lp_b, jnp.where(acc_death, lp_d, inner.logprior)),
        )
        applied = jnp.where(
            is_move, move_applied, acc_birth | acc_death
        )
        new_inner = KernelState(
            locs=locs_out,
            fluxes=fluxes_out,
            rate=rate_out,
            child_rate=None,
            parent_ll=pll_out,
            child_ll=None,
            logprior=lp_out,
        )
        return TDKernelState(counts=counts_out, inner=new_inner), applied

    def run(self, key, ctx: TargetContext, counts, locs, fluxes):
        inner = init_kernel_state(ctx, counts, locs, fluxes)
        state = TDKernelState(counts=counts, inner=inner)

        def body(carry, k):
            st, _ = carry
            st, applied = self._sweep(k, ctx, st)
            return (st, applied), None

        keys = jax.random.split(key, self.num_iters)
        (state, applied), _ = jax.lax.scan(
            body, (state, jnp.zeros(counts.shape, bool)), keys
        )
        return state, applied.astype(jnp.float32).mean(-1)


@struct.dataclass
class TDSMCConfig:
    num_particles: int = struct.field(pytree_node=False)
    ess_threshold_prop: float = struct.field(pytree_node=False, default=0.5)
    resample_method: str = struct.field(
        pytree_node=False, default="systematic"
    )
    max_smc_iters: int = struct.field(pytree_node=False, default=100)
    flux_detection_threshold: float = 0.0


class TDSMCResult(NamedTuple):
    counts: jax.Array  # [T, N]
    locs: jax.Array  # [T, N, M, 2]
    fluxes: jax.Array  # [T, N, M]
    pruned_counts: jax.Array
    pruned_locs: jax.Array
    pruned_fluxes: jax.Array
    log_normalizing_constant: jax.Array  # [T]
    temperature: jax.Array  # [T]
    ess: jax.Array  # [T]
    num_iters: jax.Array
    acc_rate: jax.Array  # [T]


def run_tdsmc(key, images, prior, model, kernel: BirthDeathMH,
              cfg: TDSMCConfig) -> TDSMCResult:
    """Single-population tempered SMC with transdimensional mutation.

    ``images``: ``[T, h, w]``. The posterior over counts comes from the
    particle counts themselves rather than per-stratum normalising
    constants.
    """
    T = images.shape[0]
    N = cfg.num_particles

    key, k_init = jax.random.split(key)
    counts, locs, fluxes = prior.sample(k_init, N, batch_shape=(T,))

    def context(temperature):
        return TargetContext(
            prior=prior,
            model=model,
            image=images[:, None],
            temperature=temperature[:, None],
        )

    ll0 = model.loglikelihood(images[:, None], locs, fluxes)

    class Carry(NamedTuple):
        key: jax.Array
        counts: jax.Array
        locs: jax.Array
        fluxes: jax.Array
        loglik: jax.Array
        weights: jax.Array
        log_z: jax.Array
        temperature: jax.Array
        acc_rate: jax.Array
        iteration: jax.Array

    def temper_reweight(c: Carry):
        done = c.temperature >= 1.0
        delta = solve_tempering_step(
            c.loglik, c.temperature, cfg.ess_threshold_prop * N
        )
        delta = jnp.where(done, 0.0, delta)
        temperature = jnp.clip(c.temperature + delta, 0.0, 1.0)
        w_log = delta[:, None] * c.loglik
        m = w_log.max(-1)
        shifted = jnp.exp(w_log - m[:, None])
        s = shifted.sum(-1)
        weights = shifted / s[:, None]
        log_z = c.log_z + jnp.where(done, 0.0, m + jnp.log(s / N))
        weights = jnp.where(done[:, None], c.weights, weights)
        return c._replace(
            weights=weights, log_z=log_z, temperature=temperature
        )

    carry = Carry(
        key=key,
        counts=counts,
        locs=locs,
        fluxes=fluxes,
        loglik=ll0,
        weights=jnp.full((T, N), 1.0 / N),
        log_z=jnp.zeros(T),
        temperature=jnp.zeros(T),
        acc_rate=jnp.zeros(T),
        iteration=jnp.asarray(0, jnp.int32),
    )
    carry = temper_reweight(carry)

    def cond(c):
        return jnp.any(c.temperature < 1.0) & (
            c.iteration < cfg.max_smc_iters
        )

    def body(c):
        key, k_res, k_mut = jax.random.split(c.key, 3)
        done = c.temperature >= 1.0
        keep = done[:, None]

        idx = resample_indices(k_res, c.weights, N, cfg.resample_method)
        counts, locs, fluxes = gather_particles(
            idx, c.counts, c.locs, c.fluxes, particle_axis=1
        )
        counts = jnp.where(keep, c.counts, counts)
        locs = jnp.where(keep[..., None, None], c.locs, locs)
        fluxes = jnp.where(keep[..., None], c.fluxes, fluxes)

        ctx = context(c.temperature)
        tdstate, acc = kernel.run(k_mut, ctx, counts, locs, fluxes)
        counts = jnp.where(keep, counts, tdstate.counts)
        locs = jnp.where(keep[..., None, None], locs, tdstate.inner.locs)
        fluxes = jnp.where(keep[..., None], fluxes, tdstate.inner.fluxes)
        loglik = jnp.where(keep, c.loglik, tdstate.inner.parent_ll)

        c = c._replace(
            key=key,
            counts=counts,
            locs=locs,
            fluxes=fluxes,
            loglik=loglik,
            weights=jnp.where(keep, c.weights, 1.0 / N),
            acc_rate=jnp.where(done, c.acc_rate, acc),
            iteration=c.iteration + 1,
        )
        return temper_reweight(c)

    carry = jax.lax.while_loop(cond, body, carry)

    key, k_final = jax.random.split(carry.key)
    idx = resample_indices(k_final, carry.weights, N, cfg.resample_method)
    counts, locs, fluxes = gather_particles(
        idx, carry.counts, carry.locs, carry.fluxes, particle_axis=1
    )
    M = fluxes.shape[-1]
    pruned_counts, pruned_locs, pruned_fluxes = prune_catalog(
        locs,
        fluxes,
        height=model.height,
        width=model.width,
        flux_threshold=cfg.flux_detection_threshold,
        mask=slot_mask(counts, M),
    )
    ess = 1.0 / (carry.weights**2).sum(-1)
    return TDSMCResult(
        counts=counts,
        locs=locs,
        fluxes=fluxes,
        pruned_counts=pruned_counts,
        pruned_locs=pruned_locs,
        pruned_fluxes=pruned_fluxes,
        log_normalizing_constant=carry.log_z,
        temperature=carry.temperature,
        ess=ess,
        num_iters=carry.iteration,
        acc_rate=carry.acc_rate,
    )
