"""Transdimensional SMC: birth/death moves over the object count.

CS-SMC (inference/smc.py) handles the unknown object count by running one
sampler per count stratum (manuscript.tex:312-380). This module provides
the classic alternative — a single likelihood-tempered SMC population
whose particles move across counts via reversible-jump birth/death
proposals (BASELINE.json configs[2]) — useful when the count range is too
large to stratify densely, and as an independent cross-check of the
stratified posterior.

``BirthDeathMH`` alternates up to five proposal types per sweep, chosen
independently per particle:

- move: the single-component truncated-normal update of
  ``SingleComponentMH``;
- birth (count -> count + 1): a new star drawn from the prior marks; the
  proposal density cancels the prior terms, so the acceptance ratio is
  ``p_count(n+1)/p_count(n) * L(new)/L(old) * P_death/(P_birth) *
  (n+1 slots bookkeeping)``;
- death (count -> count - 1): remove a uniformly chosen active star
  (the reverse of birth);
- split (count -> count + 1, ``prob_split > 0``): replace one star
  ``(f, l)`` with two children ``(u f, l + (1-u) d)`` and
  ``((1-u) f, l - u d)`` where ``u ~ Beta(a, a)`` and
  ``d ~ N(0, split_scale^2 I_2)`` — total flux and flux-weighted
  centroid are conserved, and the Jacobian of the dimension-matching
  map is exactly ``f``;
- merge (count -> count - 1): the reverse — a proximity-weighted pair
  is replaced by one star carrying the summed flux at the
  flux-weighted centroid, with reverse-split auxiliaries
  ``u* = f_i/f``, ``d* = l_i - l_j`` and Jacobian ``1/f``.

With prior-draw births and uniform-choice deaths the Jacobian is 1 and
the mark densities cancel, leaving the count-prior ratio, the tempered
likelihood ratio, and the ``P_b/P_d * 1/(n+1)``-style correction.

Split/merge is the cure for the *split mode* that defeats plain
birth/death RJ on bright stars (docs/results/RESULTS.md MCMC-anchor
study): once a bright star is explained as two overlapping halves, a
death of either half leaves its flux unexplained and is always
rejected — only the coordinated pair move (sum the fluxes, keep the
centroid) can take the chain back in one step. The reference has no
analogue (its kernel is single-site only, kernel.py:7-130).
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
    """Reversible-jump birth/death(/split/merge) + single-component move
    kernel. ``prob_split``/``prob_merge`` are static so the split/merge
    branches compile away when disabled (the default, matching the
    round-3 behavior)."""

    num_iters: int = struct.field(pytree_node=False)
    move: SingleComponentMH = None
    prob_birth: float = 0.2
    prob_death: float = 0.2
    prob_split: float = struct.field(pytree_node=False, default=0.0)
    prob_merge: float = struct.field(pytree_node=False, default=0.0)
    # split displacement scale (px) and Beta(a, a) flux-fraction
    # concentration; merge pair-selection softmax scale (px)
    split_scale: float = struct.field(pytree_node=False, default=1.0)
    split_flux_conc: float = struct.field(pytree_node=False, default=1.0)
    merge_select_scale: float = struct.field(pytree_node=False, default=2.0)

    def _count_log_pmf(self, prior, counts):
        return prior.counts.log_prob(counts)

    def _split_merge(self, key, ctx: TargetContext, state: TDKernelState):
        """Dimension-matched split and merge proposals (both directions
        computed; the caller's kind mask selects). See the module
        docstring for the map and its Jacobian ``f``.

        All probability bookkeeping is explicit (nothing cancels between
        the two kinds): star/pair-selection probabilities, the
        ``Beta(a, a)`` and isotropic-normal auxiliary densities with
        their normalisation constants, the count-pmf and mark-prior
        deltas, and ``+-log f`` for the Jacobian.
        """
        from smcdet_tpu.inference.kernels import (
            _apply_slot_update,
            _flux_support,
            _take_slot,
        )

        prior, model = ctx.prior, ctx.model
        counts, inner = state.counts, state.inner
        locs, fluxes = inner.locs, inner.fluxes
        batchN = counts.shape
        M = fluxes.shape[-1]
        eff = jnp.asarray(model.adu_per_nmgy)
        flux_lo, flux_hi = _flux_support(prior)
        inv2s2 = 1.0 / (2.0 * self.merge_select_scale**2)
        sig2 = self.split_scale**2
        a_conc = self.split_flux_conc
        neg = jnp.finfo(jnp.float32).min
        tiny = jnp.finfo(jnp.float32).tiny
        n_f = jnp.maximum(counts, 1).astype(jnp.float32)
        occupied = jnp.arange(M) < counts[..., None]

        (k_pick, k_u, k_d, k_mi, k_mj) = jax.random.split(key, 5)

        def log_beta_pdf(v):
            if a_conc == 1.0:
                return jnp.zeros_like(v)
            from jax.scipy.stats import beta as beta_dist

            return beta_dist.logpdf(v, a_conc, a_conc)

        def log_normal2_pdf(d):
            return -(d**2).sum(-1) / (2.0 * sig2) - jnp.log(
                2.0 * jnp.pi * sig2
            )

        def in_box(loc):
            return ((loc >= prior.loc_low) & (loc <= prior.loc_high)).all(-1)

        def flux_lp(f, safe_mask):
            if prior.flux is None:
                return jnp.zeros(batchN)
            safe = jnp.where(
                safe_mask & (f > 0), f, prior.flux.reference_point
            )
            return jnp.where(
                safe_mask, prior.flux.log_prob(safe), 0.0
            )

        def pair_logits(all_locs, loc_a, exclude, occ):
            d2 = ((all_locs - loc_a[..., None, :]) ** 2).sum(-1)
            return jnp.where(occ & ~exclude, -d2 * inv2s2, neg)

        log_area = jnp.log(prior.loc_high - prior.loc_low).sum()

        # ---------------------------- split ---------------------------
        can_split = (counts >= 1) & (counts < M)
        u_pick = jax.random.uniform(k_pick, batchN)
        pick = jnp.clip(
            jnp.floor(u_pick * counts).astype(jnp.int32), 0, counts - 1
        )
        onehot_k = jnp.arange(M) == pick[..., None]
        loc_k = _take_slot(locs, onehot_k)
        f_k = _take_slot(fluxes, onehot_k)
        u_s = jax.random.beta(k_u, a_conc, a_conc, batchN)
        d_s = self.split_scale * jax.random.normal(k_d, batchN + (2,))
        f_si = u_s * f_k
        f_sj = (1.0 - u_s) * f_k
        loc_si = loc_k + (1.0 - u_s)[..., None] * d_s
        loc_sj = loc_k - u_s[..., None] * d_s
        slot_new = jnp.minimum(counts, M - 1)
        onehot_new = jnp.arange(M) == slot_new[..., None]
        valid_split = (
            can_split
            & (f_k > 0)
            & in_box(loc_si)
            & in_box(loc_sj)
            & (f_si >= flux_lo)
            & (f_si <= flux_hi)
            & (f_sj >= flux_lo)
            & (f_sj <= flux_hi)
        )
        img_k, _ = ctx.star_images(loc_k)
        img_si, _ = ctx.star_images(loc_si)
        img_sj, _ = ctx.star_images(loc_sj)
        v = valid_split[..., None]
        rate_s = inner.rate + jnp.where(
            v,
            eff
            * (
                f_si[..., None] * img_si
                + f_sj[..., None] * img_sj
                - f_k[..., None] * img_k
            ),
            0.0,
        )
        ll_s, _ = ctx.loglik_terms(rate_s, None)
        lp_delta_s = (
            self._count_log_pmf(prior, counts + 1)
            - self._count_log_pmf(prior, counts)
            - log_area
            + flux_lp(f_si, valid_split)
            + flux_lp(f_sj, valid_split)
            - flux_lp(f_k, valid_split)
        )
        lp_s = inner.logprior + jnp.where(valid_split, lp_delta_s, 0.0)
        # reverse merge pair-selection probability in the post-split state
        always = jnp.ones(batchN, bool)
        locs_split = _apply_slot_update(locs, onehot_k, loc_si, always)
        locs_split = _apply_slot_update(
            locs_split, onehot_new, loc_sj, always
        )
        occ_split = jnp.arange(M) < (counts + 1)[..., None]
        logits_rk = pair_logits(locs_split, loc_si, onehot_k, occ_split)
        logits_rn = pair_logits(locs_split, loc_sj, onehot_new, occ_split)
        logZ_rk = jax.scipy.special.logsumexp(logits_rk, axis=-1)
        logZ_rn = jax.scipy.special.logsumexp(logits_rn, axis=-1)
        log_w_r = -(d_s**2).sum(-1) * inv2s2
        log_pair_rev = (
            log_w_r
            + jnp.logaddexp(-logZ_rk, -logZ_rn)
            - jnp.log(n_f + 1.0)
        )
        log_q_fwd_s = (
            jnp.log(self.prob_split)
            - jnp.log(n_f)
            + log_beta_pdf(u_s)
            + log_normal2_pdf(d_s)
        )
        log_q_rev_s = jnp.log(self.prob_merge) + log_pair_rev
        safe_f_k = jnp.where(valid_split, jnp.maximum(f_k, tiny), 1.0)
        la_split = (
            ctx.combine(lp_s, ll_s, None)
            - ctx.combine(inner.logprior, inner.parent_ll, None)
            + log_q_rev_s
            - log_q_fwd_s
            + jnp.log(safe_f_k)  # Jacobian
        )

        # ---------------------------- merge ---------------------------
        min_c = max(2, prior.min_objects + 1)
        can_merge = counts >= min_c
        u_mi = jax.random.uniform(k_mi, batchN)
        i = jnp.clip(
            jnp.floor(u_mi * counts).astype(jnp.int32), 0, counts - 1
        )
        onehot_mi = jnp.arange(M) == i[..., None]
        loc_mi = _take_slot(locs, onehot_mi)
        f_mi = _take_slot(fluxes, onehot_mi)
        logits_mi = pair_logits(locs, loc_mi, onehot_mi, occupied)
        g = jax.random.gumbel(k_mj, logits_mi.shape)
        j = jnp.argmax(logits_mi + g, axis=-1).astype(jnp.int32)
        onehot_mj = jnp.arange(M) == j[..., None]
        loc_mj = _take_slot(locs, onehot_mj)
        f_mj = _take_slot(fluxes, onehot_mj)
        f_m = f_mi + f_mj
        safe_m = jnp.maximum(f_m, tiny)
        cent = (
            f_mi[..., None] * loc_mi + f_mj[..., None] * loc_mj
        ) / safe_m[..., None]
        u_star = f_mi / safe_m
        d_star = loc_mi - loc_mj
        valid_merge = (
            can_merge
            & (f_m >= flux_lo)
            & (f_m <= flux_hi)
            & (u_star > 0.0)
            & (u_star < 1.0)
        )
        img_mi, _ = ctx.star_images(loc_mi)
        img_mj, _ = ctx.star_images(loc_mj)
        img_c, _ = ctx.star_images(cent)
        vm = valid_merge[..., None]
        rate_m = inner.rate + jnp.where(
            vm,
            eff
            * (
                f_m[..., None] * img_c
                - f_mi[..., None] * img_mi
                - f_mj[..., None] * img_mj
            ),
            0.0,
        )
        ll_m, _ = ctx.loglik_terms(rate_m, None)
        lp_delta_m = (
            self._count_log_pmf(prior, jnp.maximum(counts - 1, 0))
            - self._count_log_pmf(prior, counts)
            + log_area
            + flux_lp(f_m, valid_merge)
            - flux_lp(f_mi, valid_merge)
            - flux_lp(f_mj, valid_merge)
        )
        lp_m = inner.logprior + jnp.where(valid_merge, lp_delta_m, 0.0)
        logits_mj_full = pair_logits(locs, loc_mj, onehot_mj, occupied)
        logZ_mi = jax.scipy.special.logsumexp(logits_mi, axis=-1)
        logZ_mj = jax.scipy.special.logsumexp(logits_mj_full, axis=-1)
        log_w_m = -(d_star**2).sum(-1) * inv2s2
        log_pair_fwd = (
            log_w_m + jnp.logaddexp(-logZ_mi, -logZ_mj) - jnp.log(n_f)
        )
        eps = 1e-6
        u_star_safe = jnp.where(
            valid_merge, jnp.clip(u_star, eps, 1 - eps), 0.5
        )
        log_q_fwd_m = jnp.log(self.prob_merge) + log_pair_fwd
        log_q_rev_m = (
            jnp.log(self.prob_split)
            - jnp.log(n_f - 1.0)
            + log_beta_pdf(u_star_safe)
            + log_normal2_pdf(d_star)
        )
        la_merge = (
            ctx.combine(lp_m, ll_m, None)
            - ctx.combine(inner.logprior, inner.parent_ll, None)
            + log_q_rev_m
            - log_q_fwd_m
            - jnp.log(jnp.where(valid_merge, safe_m, 1.0))  # 1/Jacobian
        )

        return {
            "valid_split": valid_split,
            "la_split": la_split,
            "onehot_k": onehot_k,
            "onehot_new": onehot_new,
            "loc_si": loc_si,
            "f_si": f_si,
            "loc_sj": loc_sj,
            "f_sj": f_sj,
            "rate_s": rate_s,
            "ll_s": ll_s,
            "lp_s": lp_s,
            "valid_merge": valid_merge,
            "la_merge": la_merge,
            "onehot_mi": onehot_mi,
            "onehot_mj": onehot_mj,
            "cent": cent,
            "f_m": f_m,
            "merge_i": i,
            "rate_m": rate_m,
            "ll_m": ll_m,
            "lp_m": lp_m,
        }

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
            k_sm,
        ) = jax.random.split(key, 7)

        use_sm = self.prob_split > 0.0 or self.prob_merge > 0.0
        u_kind = jax.random.uniform(k_kind, batchN)
        do_birth = u_kind < self.prob_birth
        do_death = (u_kind >= self.prob_birth) & (
            u_kind < self.prob_birth + self.prob_death
        )
        p_bd = self.prob_birth + self.prob_death
        do_split = use_sm & (u_kind >= p_bd) & (
            u_kind < p_bd + self.prob_split
        )
        do_merge = use_sm & (u_kind >= p_bd + self.prob_split) & (
            u_kind < p_bd + self.prob_split + self.prob_merge
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

        # ------------------------- split / merge ----------------------
        if use_sm:
            sm = self._split_merge(k_sm, ctx, state)
        else:
            sm = None

        # ------------------------- select + accept --------------------
        u = jax.random.uniform(k_acc, batchN)
        acc_birth = (
            do_birth & can_birth & (u <= jnp.exp(jnp.minimum(la_birth, 0.0)))
        )
        acc_death = (
            do_death & can_death & (u <= jnp.exp(jnp.minimum(la_death, 0.0)))
        )
        if use_sm:
            acc_split = (
                do_split
                & sm["valid_split"]
                & (u <= jnp.exp(jnp.minimum(sm["la_split"], 0.0)))
            )
            acc_merge = (
                do_merge
                & sm["valid_merge"]
                & (u <= jnp.exp(jnp.minimum(sm["la_merge"], 0.0)))
            )
        else:
            acc_split = acc_merge = jnp.zeros(batchN, bool)

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

        # apply split/merge (kind masks are disjoint, so stacking the
        # slot writes onto the same running arrays is exact)
        if use_sm:
            from smcdet_tpu.inference.kernels import (
                _apply_slot_update,
                _take_slot,
            )

            locs2 = _apply_slot_update(
                locs2, sm["onehot_k"], sm["loc_si"], acc_split
            )
            locs2 = _apply_slot_update(
                locs2, sm["onehot_new"], sm["loc_sj"], acc_split
            )
            fluxes2 = _apply_slot_update(
                fluxes2, sm["onehot_k"], sm["f_si"], acc_split
            )
            fluxes2 = _apply_slot_update(
                fluxes2, sm["onehot_new"], sm["f_sj"], acc_split
            )
            # merge: merged star -> slot i; the last active slot fills
            # the gap at slot j (reading the post-i-write value so
            # i == last is handled); the last slot is then zeroed
            m_last = jnp.maximum(counts - 1, 0)
            onehot_mlast = jnp.arange(M) == m_last[..., None]
            i_is_last = sm["merge_i"] == m_last
            mlast_loc = jnp.where(
                i_is_last[..., None], sm["cent"], _take_slot(locs, onehot_mlast)
            )
            mlast_flux = jnp.where(
                i_is_last, sm["f_m"], _take_slot(fluxes, onehot_mlast)
            )
            locs2 = _apply_slot_update(
                locs2, sm["onehot_mi"], sm["cent"], acc_merge
            )
            locs2 = _apply_slot_update(
                locs2, sm["onehot_mj"], mlast_loc, acc_merge
            )
            locs2 = _apply_slot_update(
                locs2, onehot_mlast, jnp.zeros(batchN + (2,)), acc_merge
            )
            fluxes2 = _apply_slot_update(
                fluxes2, sm["onehot_mi"], sm["f_m"], acc_merge
            )
            fluxes2 = _apply_slot_update(
                fluxes2, sm["onehot_mj"], mlast_flux, acc_merge
            )
            fluxes2 = _apply_slot_update(
                fluxes2, onehot_mlast, jnp.zeros(batchN), acc_merge
            )

        is_move = ~(do_birth | do_death | do_split | do_merge)
        sel_move = is_move[..., None]
        locs_out = jnp.where(sel_move[..., None], moved.locs, locs2)
        fluxes_out = jnp.where(sel_move, moved.fluxes, fluxes2)

        counts_out = (
            counts
            + acc_birth.astype(jnp.int32)
            - acc_death.astype(jnp.int32)
            + acc_split.astype(jnp.int32)
            - acc_merge.astype(jnp.int32)
        )

        rate_out = jnp.where(
            acc_birth[..., None],
            rate_b,
            jnp.where(acc_death[..., None], rate_d, inner.rate),
        )
        pll_out = jnp.where(
            acc_birth, ll_b, jnp.where(acc_death, ll_d, inner.parent_ll)
        )
        lp_out = jnp.where(
            acc_birth, lp_b, jnp.where(acc_death, lp_d, inner.logprior)
        )
        if use_sm:
            rate_out = jnp.where(
                acc_split[..., None],
                sm["rate_s"],
                jnp.where(acc_merge[..., None], sm["rate_m"], rate_out),
            )
            pll_out = jnp.where(
                acc_split,
                sm["ll_s"],
                jnp.where(acc_merge, sm["ll_m"], pll_out),
            )
            lp_out = jnp.where(
                acc_split,
                sm["lp_s"],
                jnp.where(acc_merge, sm["lp_m"], lp_out),
            )
        rate_out = jnp.where(is_move[..., None], moved.rate, rate_out)
        pll_out = jnp.where(is_move, moved.parent_ll, pll_out)
        lp_out = jnp.where(is_move, moved.logprior, lp_out)
        applied = jnp.where(
            is_move,
            move_applied,
            acc_birth | acc_death | acc_split | acc_merge,
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
