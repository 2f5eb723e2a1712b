"""Single-component mutation kernels (MH and MALA), layer L2.

TPU-native re-design of /root/reference/smcdet/kernel.py:7-275.

The reference's 100-iteration python sweep re-renders *every* star of every
catalog at each iteration (kernel.py:42-130 → images.py:28-76). Here the
sweep is a ``lax.scan`` whose carry holds the rendered rate image of every
particle, and each sweep updates it *incrementally*: moving one star only
costs two single-star renders instead of M, an O(M) saving on the hottest
loop in the framework. The pixel-likelihood reduction and the prior terms
of the changed slot are then recomputed exactly.

Both kernels operate on batched particle arrays ``[..., N, M(, 2)]`` with a
fixed-shape padded-catalog convention (slot m active iff ``m < count``), and
accept a ``TargetContext`` describing the tempered target so the same sweep
code drives the tile-level SMC and the aggregation bridge.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from smcdet_tpu.distributions import (
    truncated_normal_log_mass,
    truncated_normal_log_prob,
    truncated_normal_sample,
)

__all__ = [
    "TargetContext",
    "KernelState",
    "SingleComponentMH",
    "SingleComponentMALA",
    "relocate_sweeps",
    "pair_redistribute_sweeps",
]


@struct.dataclass
class TargetContext:
    """Tempered target decomposed for incremental single-component updates.

    The tile-level target is ``logprior + temperature * loglik``
    (sampler.py:87-91). The aggregation bridge re-weights two likelihood
    terms (aggregate.py:105-130); it supplies its own context via
    ``extra_rate_images`` (see inference/aggregate.py).

    Fields:
    - ``prior``: PointProcessPrior (flux marks used for the prior delta).
    - ``model``: ImageModel for the (parent) image.
    - ``image``: observed image ``[..., H, W]``, broadcastable against
      rates; flattened internally (``image_flat``) — all caches carry
      pixels flat (see ``ImageModel.star_image_flat`` for why).
    - ``temperature``: broadcastable against ``[..., N]``.
    """

    prior: Any
    model: Any
    image: jax.Array
    temperature: jax.Array

    @property
    def image_flat(self):
        return self.image.reshape(self.image.shape[:-2] + (-1,))
    # Optional second likelihood term (the aggregation "child" product):
    # a callable producing a side mask for a star at loc, plus the child
    # image model; None for the plain tile-level target.
    child_model: Optional[Any] = None
    child_side_mask: Optional[Callable] = struct.field(
        pytree_node=False, default=None
    )
    # Origin-side child assignment (the exact product-of-children base
    # measure — see inference/aggregate.py): per-slot side tags
    # ``[..., N, M]`` (1 = even/first child) that stay fixed under
    # mutation, so a star always renders into the child window it was
    # sampled by, and a frozen "ghost" rate ``[..., N, HW]`` carrying the
    # overlap-dedup-dropped stars in the child term only. When
    # ``child_slot_side`` is None the legacy location-based mask applies.
    child_slot_side: Optional[jax.Array] = None
    child_ghost_rate: Optional[jax.Array] = None

    # ------------------------------------------------------------------
    def _side_window(self, side):
        """Child pixel window for stars with side tags ``side`` [...]."""
        axis = self.child_side_mask.axis
        boundary = self.child_side_mask.boundary
        p = jnp.arange(self.model.height * self.model.width)
        coord = p // self.model.width if axis == 0 else p % self.model.width
        even_pix = coord < boundary  # [HW]
        return jnp.where(side[..., None] > 0.5, even_pix, ~even_pix)

    def star_images(self, loc, side=None):
        """Render the flat-pixel contribution of one star at ``loc``.

        Returns ``(parent_img, child_img_or_None)`` as ``[..., H*W]``; the
        child contribution is the parent-side render masked to the star's
        child tile — the tile that sampled it (``side``, origin mode) or
        the tile its location falls in (legacy) — which makes the sum of
        child log-likelihoods expressible over the joined image (see
        inference/aggregate.py).
        """
        img = self.model.star_image_flat(loc)
        if self.child_model is None:
            return img, None
        if self.child_slot_side is not None:
            if side is None:
                raise ValueError(
                    "origin-side child context requires the slot side"
                )
            child = img * self._side_window(side)
        else:
            child = img * self.child_side_mask(loc)
        return img, child

    def init_rates(self, locs, fluxes):
        """Full renders seeding the incremental caches.

        Accumulated slot by slot with a ``lax.scan`` over M: the broadcast
        formulation materialises ``[..., M, H, W]`` intermediates, which
        measure ~20x slower than M sequential ``[..., H, W]`` renders on
        TPU (the per-star images are only ever reduced over M anyway).
        """
        eff = jnp.asarray(self.model.adu_per_nmgy) * fluxes  # [..., M]
        M = fluxes.shape[-1]
        bg = jnp.asarray(self.model.background)
        if bg.ndim >= 2:
            # per-tile background map: flatten the trailing [H, W] image
            # dims to match the flat-pixel rate layout (any leading batch
            # dims must broadcast against the particle batch)
            bg = bg.reshape(bg.shape[:-2] + (-1,))
        zero = jnp.zeros(
            fluxes.shape[:-1] + (self.model.height * self.model.width,)
        )

        def step(carry, m):
            rate, child_rate = carry
            loc_m = jax.lax.dynamic_index_in_dim(locs, m, axis=-2,
                                                 keepdims=False)
            f_m = jax.lax.dynamic_index_in_dim(eff, m, axis=-1,
                                               keepdims=False)
            side_m = (
                jax.lax.dynamic_index_in_dim(
                    self.child_slot_side, m, axis=-1, keepdims=False
                )
                if self.child_slot_side is not None
                else None
            )
            img, child_img = self.star_images(loc_m, side_m)  # [..., HW]
            rate = rate + f_m[..., None] * img
            if child_rate is not None:
                child_rate = child_rate + f_m[..., None] * child_img
            return (rate, child_rate), None

        # the ghost rate (dedup-dropped stars, frozen) seeds the child term
        child_zero = zero if self.child_ghost_rate is None else (
            zero + self.child_ghost_rate
        )
        init = (zero, None if self.child_model is None else child_zero)
        (rate, child_rate), _ = jax.lax.scan(
            step, init, jnp.arange(M), length=M
        )
        if self.child_model is None:
            return rate + bg, None
        return rate + bg, child_rate + bg

    def loglik_terms(self, rate, child_rate):
        """Per-term log-likelihoods from flat-pixel rates:
        (parent_ll, child_ll_or_None)."""
        parent_ll = self.model.loglikelihood_from_rate_flat(
            self.image_flat, rate
        )
        if self.child_model is None:
            return parent_ll, None
        child_ll = self.child_model.loglikelihood_from_rate_flat(
            self.image_flat, child_rate
        )
        return parent_ll, child_ll

    def combine(self, logprior, parent_ll, child_ll):
        """Tempered log-target from its cached pieces."""
        if self.child_model is None:
            return logprior + self.temperature * parent_ll
        return (
            logprior
            + self.temperature * parent_ll
            + (1.0 - self.temperature) * child_ll
        )


class KernelState(NamedTuple):
    """Cached quantities carried across sweeps (and across mutate calls)."""

    locs: jax.Array  # [..., N, M, 2]
    fluxes: jax.Array  # [..., N, M]
    rate: jax.Array  # [..., N, H*W] (flat pixels)
    child_rate: Optional[jax.Array]  # [..., N, H*W] or None
    parent_ll: jax.Array  # [..., N]
    child_ll: Optional[jax.Array]  # [..., N] or None
    logprior: jax.Array  # [..., N]


def init_kernel_state(ctx: TargetContext, counts, locs, fluxes) -> KernelState:
    rate, child_rate = ctx.init_rates(locs, fluxes)
    parent_ll, child_ll = ctx.loglik_terms(rate, child_rate)
    logprior = ctx.prior.log_prob(counts, locs, fluxes)
    return KernelState(
        locs=locs,
        fluxes=fluxes,
        rate=rate,
        child_rate=child_rate,
        parent_ll=parent_ll,
        child_ll=child_ll,
        logprior=logprior,
    )


def _flux_prior_delta(prior, active, f_old, f_new):
    if prior.flux is None:
        return jnp.zeros_like(f_old)
    ref = prior.flux.reference_point
    safe_old = jnp.where(active, f_old, ref)
    safe_new = jnp.where(active, f_new, ref)
    return jnp.where(
        active,
        prior.flux.log_prob(safe_new) - prior.flux.log_prob(safe_old),
        0.0,
    )


def _effective_flux_floor(kernel_fluxes_min, prior):
    """Proposal truncation floor clamped into the flux prior's support.

    A floor below the support (e.g. the default 0.0 with a Pareto-family
    flux mark) makes the sampled target improper on (floor, support_lower)
    and lets a proposal land exactly on the boundary with log-prior
    +/-inf, which poisons the cached logprior with NaN and silently
    freezes the particle. Truncating proposals at the support floor keeps
    the MH correction exact (the same bound enters the proposal density).
    """
    lo = jnp.asarray(kernel_fluxes_min)
    if prior.flux is not None:
        lo = jnp.maximum(lo, prior.flux.support_lower)
    return lo


def _take_slot(values, onehot):
    """Read object slot ``j`` (encoded as ``onehot`` ``[..., N, M]``) from
    ``values`` ``[..., N, M, *ev]`` as a masked sum.

    NOTE (TPU): this deliberately avoids ``take_along_axis`` — a dynamic
    gather along the tiny slot axis lowers to a serial per-element gather
    on TPU and costs ~8x the entire rest of the sweep; the one-hot
    contraction is fused into surrounding elementwise work for free.
    """
    ev = values.ndim - onehot.ndim
    oh = onehot.reshape(onehot.shape + (1,) * ev)
    return (values * oh).sum(onehot.ndim - 1)


def _apply_slot_update(values, onehot, new_slot, apply):
    """Write ``new_slot`` into the one-hot slot where ``apply``.

    ``values``: ``[..., N, M, *ev]``; ``onehot``/``apply``: ``[..., N, M]``
    / ``[..., N]``; ``new_slot``: ``[..., N, *ev]``.
    """
    ev = values.ndim - onehot.ndim
    sel = (onehot & apply[..., None]).reshape(onehot.shape + (1,) * ev)
    new = jnp.expand_dims(new_slot, axis=onehot.ndim - 1)
    return jnp.where(sel, new, values)


@struct.dataclass
class SingleComponentMH:
    """Random-walk single-component Metropolis-Hastings.

    Parity: kernel.py:7-130 — per sweep, one uniformly-chosen object slot per
    catalog gets a truncated-normal move of its location and flux, accepted
    with the tempered MH ratio including the truncation proposal correction;
    the accepted log-target is cached across sweeps (kernel.py:125).
    """

    num_iters: int = struct.field(pytree_node=False)
    locs_stdev: jax.Array = 0.1
    fluxes_stdev: jax.Array = 1.0
    fluxes_min: jax.Array = 0.0
    fluxes_max: jax.Array = 1e6
    # "auto": fused Pallas sweep loop on TPU when the target supports it
    # (ops/pallas_sweep.py); "xla": always the lax.scan path below.
    backend: str = struct.field(pytree_node=False, default="auto")
    # jsm2024 parity knob (reference normalfluxes_tiles_32x32/
    # run_smc_mh.py:57-73: ``max_iters`` + ``sqjumpdist_tol``): stop
    # sweeping early once the batch-mean squared location jump of a
    # sweep falls below this tolerance, up to ``num_iters``. None
    # (default) keeps the fixed-count scan. Early stopping requires the
    # host-free ``lax.while_loop`` XLA path (the fused Pallas kernel
    # runs its sweep loop on-core with a static trip count).
    sqjumpdist_tol: float | None = struct.field(
        pytree_node=False, default=None
    )

    def sweep(self, key, ctx: TargetContext, counts, state: KernelState):
        locs, fluxes = state.locs, state.fluxes
        batchN = counts.shape
        M = fluxes.shape[-1]
        k_j, k_loc, k_flux, k_acc = jax.random.split(key, 4)

        # uniform over the occupied slot prefix (slots 0..count-1), not
        # all M padded slots: the reference proposes over every slot
        # (kernel.py:35-44), wasting (M-s)/M of each sweep on no-op
        # proposals. Occupied slots are exchangeable so this selection is
        # symmetric; the kernel stays exact for the same stratum target.
        u_j = jax.random.uniform(k_j, batchN)
        j = jnp.minimum(
            jnp.floor(u_j * counts).astype(jnp.int32), counts - 1
        )
        active = counts > 0
        onehot = jnp.arange(M) == j[..., None]  # [..., N, M]

        loc_j = _take_slot(locs, onehot)  # [..., N, 2]
        f_j = _take_slot(fluxes, onehot)

        loc_low = ctx.prior.loc_low
        loc_high = ctx.prior.loc_high
        f_lo = _effective_flux_floor(self.fluxes_min, ctx.prior)
        loc_prop = truncated_normal_sample(
            k_loc, loc_j, self.locs_stdev, loc_low, loc_high
        )
        f_prop = truncated_normal_sample(
            k_flux, f_j, self.fluxes_stdev, f_lo, self.fluxes_max
        )

        # Incremental rate update: remove old star, add proposed star.
        eff = jnp.asarray(ctx.model.adu_per_nmgy)
        side_j = (
            _take_slot(ctx.child_slot_side, onehot)
            if ctx.child_slot_side is not None
            else None
        )
        old_parent, old_child = ctx.star_images(loc_j, side_j)
        new_parent, new_child = ctx.star_images(loc_prop, side_j)
        a = active[..., None]
        dparent = eff * (
            f_prop[..., None] * new_parent
            - f_j[..., None] * old_parent
        )
        rate_prop = state.rate + jnp.where(a, dparent, 0.0)
        if state.child_rate is not None:
            dchild = eff * (
                f_prop[..., None] * new_child
                - f_j[..., None] * old_child
            )
            child_rate_prop = state.child_rate + jnp.where(a, dchild, 0.0)
        else:
            child_rate_prop = None

        parent_ll_prop, child_ll_prop = ctx.loglik_terms(
            rate_prop, child_rate_prop
        )
        logprior_prop = state.logprior + _flux_prior_delta(
            ctx.prior, active, f_j, f_prop
        )

        log_target_old = ctx.combine(
            state.logprior, state.parent_ll, state.child_ll
        )
        log_target_new = ctx.combine(
            logprior_prop, parent_ll_prop, child_ll_prop
        )

        # Truncation-aware proposal correction for slot j only
        # (kernel.py:71-112). The Gaussian kernels cancel for the
        # symmetric random walk, leaving only truncation-mass terms
        # (see truncated_normal_log_mass) — exact, half the Phi evals.
        log_q_rev_minus_fwd = (
            truncated_normal_log_mass(
                loc_j, self.locs_stdev, loc_low, loc_high
            ).sum(-1)
            - truncated_normal_log_mass(
                loc_prop, self.locs_stdev, loc_low, loc_high
            ).sum(-1)
            + truncated_normal_log_mass(
                f_j, self.fluxes_stdev, f_lo, self.fluxes_max
            )
            - truncated_normal_log_mass(
                f_prop, self.fluxes_stdev, f_lo, self.fluxes_max
            )
        )

        log_alpha = (
            log_target_new - log_target_old + log_q_rev_minus_fwd
        )
        u = jax.random.uniform(k_acc, batchN)
        accept = u <= jnp.exp(jnp.minimum(log_alpha, 0.0))
        apply = accept & active

        new_locs = _apply_slot_update(locs, onehot, loc_prop, apply)
        new_fluxes = _apply_slot_update(fluxes, onehot, f_prop, apply)
        a_px = apply[..., None]
        new_state = KernelState(
            locs=new_locs,
            fluxes=new_fluxes,
            rate=jnp.where(a_px, rate_prop, state.rate),
            child_rate=(
                None
                if state.child_rate is None
                else jnp.where(a_px, child_rate_prop, state.child_rate)
            ),
            parent_ll=jnp.where(apply, parent_ll_prop, state.parent_ll),
            child_ll=(
                None
                if state.child_ll is None
                else jnp.where(apply, child_ll_prop, state.child_ll)
            ),
            logprior=jnp.where(apply, logprior_prop, state.logprior),
        )
        # NOTE: the reference reports raw `accept` (kernel.py:130), which
        # counts proposals on inactive slots (~60% spuriously "accepted");
        # we report actual applied moves.
        return new_state, apply

    def run(self, key, ctx: TargetContext, counts, locs, fluxes):
        """Run ``num_iters`` sweeps; returns the final ``KernelState`` plus
        the per-batch acceptance rate (kernel.py:130 reports the last
        sweep's; the Pallas path reports the average over sweeps)."""
        state = init_kernel_state(ctx, counts, locs, fluxes)
        return self.run_from_state(key, ctx, counts, state)

    def run_from_state(self, key, ctx: TargetContext, counts,
                       state: KernelState):
        """Like ``run`` but reuses caller-provided caches (rate image,
        likelihood, prior) — the SMC loop carries them across iterations
        through resampling instead of re-rendering every catalog."""
        locs, fluxes = state.locs, state.fluxes

        if self.sqjumpdist_tol is not None:
            if self.backend == "pallas":
                raise NotImplementedError(
                    "sqjumpdist_tol early stopping needs a data-dependent "
                    "trip count — use backend='auto' or 'xla'"
                )
            return _run_sweeps_early_stop(self, key, ctx, counts, state)

        if self.backend != "xla":
            from smcdet_tpu.ops import pallas_sweep

            if pallas_sweep.supports(ctx, self):
                locs2, fluxes2, rate, pll, lp, acc, crate, cll = (
                    pallas_sweep.pallas_mh_sweeps(
                        key, ctx, self, counts, locs, fluxes,
                        state.rate, state.parent_ll, state.logprior,
                        child_rate=state.child_rate,
                        child_ll=state.child_ll,
                    )
                )
                state = KernelState(
                    locs=locs2,
                    fluxes=fluxes2,
                    rate=rate,
                    child_rate=crate,
                    parent_ll=pll,
                    child_ll=cll,
                    logprior=lp,
                )
                return state, acc.mean(-1)
            if self.backend == "pallas":
                raise NotImplementedError(
                    "pallas backend requested but this target configuration "
                    "is not supported by the fused kernel"
                )

        def body(carry, k):
            st, acc_n = carry
            st, accept = self.sweep(k, ctx, counts, st)
            return (st, acc_n + accept.astype(jnp.float32)), None

        # mean applied fraction over ALL sweeps (matching the Pallas
        # path's accounting), not just the final sweep's
        keys = jax.random.split(key, self.num_iters)
        acc0 = jnp.zeros(counts.shape, dtype=jnp.float32)
        (state, acc_n), _ = jax.lax.scan(body, (state, acc0), keys)
        acc_rate = (acc_n / self.num_iters).mean(-1)
        return state, acc_rate


def _run_sweeps_early_stop(kernel, key, ctx: TargetContext, counts,
                           state: KernelState):
    """Sweep until the batch-mean squared location jump per sweep drops
    below ``kernel.sqjumpdist_tol``, capped at ``kernel.num_iters``.

    jsm2024 parity (reference normalfluxes_tiles_32x32/run_smc_mh.py:
    57-73 constructs kernels with ``max_iters=100, sqjumpdist_tol=1e-2``;
    the implementing ``smc.*`` package is absent from the reference repo,
    so the convergence statistic is reconstructed from the name and the
    tolerance scale: with ``locs_stdev=0.25`` an equilibrated sweep's
    mean accepted squared loc-jump is a few 1e-2 px^2, decaying as chains
    converge). Rejected proposals contribute zero jump, so the statistic
    is acceptance-weighted mixing speed. Runs as a host-free
    ``lax.while_loop`` — one extra subtraction per sweep; the trip count
    becomes data-dependent, which is why the fused Pallas kernel (static
    on-core trip count) does not serve this mode.
    """
    tol = jnp.float32(kernel.sqjumpdist_tol)

    def cond(carry):
        _, _, i, sqjd = carry
        return (i < kernel.num_iters) & (sqjd >= tol)

    def body(carry):
        st, acc_n, i, _ = carry
        st2, accept = kernel.sweep(
            jax.random.fold_in(key, i), ctx, counts, st
        )
        sqjd = ((st2.locs - st.locs) ** 2).sum((-1, -2)).mean()
        return (st2, acc_n + accept.astype(jnp.float32), i + 1, sqjd)

    init = (
        state,
        jnp.zeros(counts.shape, dtype=jnp.float32),
        jnp.int32(0),
        jnp.float32(jnp.inf),
    )
    state, acc_n, iters, _ = jax.lax.while_loop(cond, body, init)
    acc_rate = (acc_n / jnp.maximum(iters, 1).astype(jnp.float32)).mean(-1)
    return state, acc_rate


def relocate_sweeps(key, ctx: TargetContext, counts, state: KernelState,
                    num_sweeps: int):
    """Independence (prior-draw) relocation of one active star per sweep.

    The aggregation bridge's mixing fix: a random-walk single-component
    move cannot carry a star across the low-probability valley between a
    child-tile mode and the joint-parent mode when a source sits on a tile
    corner/boundary (the multimodal scenario of
    /root/reference/experiments/m71synthetic/divideandconquer.ipynb; the
    reference mutates the bridge with the same random-walk kernel,
    aggregate.py:176-187, and simply mixes slowly). A prior-draw proposal
    jumps anywhere in the padded box in one move: slot ``j`` gets
    ``loc ~ Uniform(box)``, ``flux ~ prior marks``, and because proposal
    density and prior terms cancel, the acceptance ratio reduces to the
    tempered likelihood-term ratio. Counts never change, so the bridge's
    fixed stratum structure stays valid.
    """
    locs_shape = state.locs.shape

    def sweep(st: KernelState, k):
        locs, fluxes = st.locs, st.fluxes
        batchN = counts.shape
        M = fluxes.shape[-1]
        k_j, k_loc, k_flux, k_acc = jax.random.split(k, 4)

        # uniform over the occupied slot prefix (slots 0..count-1), not
        # all M padded slots: the reference proposes over every slot
        # (kernel.py:35-44), wasting (M-s)/M of each sweep on no-op
        # proposals. Occupied slots are exchangeable so this selection is
        # symmetric; the kernel stays exact for the same stratum target.
        u_j = jax.random.uniform(k_j, batchN)
        j = jnp.minimum(
            jnp.floor(u_j * counts).astype(jnp.int32), counts - 1
        )
        active = counts > 0
        onehot = jnp.arange(M) == j[..., None]

        loc_j = _take_slot(locs, onehot)
        f_j = _take_slot(fluxes, onehot)

        prior = ctx.prior
        loc_prop = prior.loc_low + (
            prior.loc_high - prior.loc_low
        ) * jax.random.uniform(k_loc, batchN + (2,))
        if prior.flux is not None:
            f_prop = prior.flux.sample(k_flux, batchN)
        else:
            f_prop = f_j

        eff = jnp.asarray(ctx.model.adu_per_nmgy)
        side_j = (
            _take_slot(ctx.child_slot_side, onehot)
            if ctx.child_slot_side is not None
            else None
        )
        old_parent, old_child = ctx.star_images(loc_j, side_j)
        new_parent, new_child = ctx.star_images(loc_prop, side_j)
        a = active[..., None]
        dparent = eff * (
            f_prop[..., None] * new_parent - f_j[..., None] * old_parent
        )
        rate_prop = st.rate + jnp.where(a, dparent, 0.0)
        if st.child_rate is not None:
            dchild = eff * (
                f_prop[..., None] * new_child - f_j[..., None] * old_child
            )
            child_rate_prop = st.child_rate + jnp.where(a, dchild, 0.0)
        else:
            child_rate_prop = None

        parent_ll_prop, child_ll_prop = ctx.loglik_terms(
            rate_prop, child_rate_prop
        )
        logprior_prop = st.logprior + _flux_prior_delta(
            prior, active, f_j, f_prop
        )

        # Prior-draw proposal: q_fwd = prior(mark_new), q_rev =
        # prior(mark_old); these cancel the logprior delta, leaving the
        # tempered likelihood-term ratio.
        log_q_rev_minus_fwd = -_flux_prior_delta(prior, active, f_j, f_prop)
        log_alpha = (
            ctx.combine(logprior_prop, parent_ll_prop, child_ll_prop)
            - ctx.combine(st.logprior, st.parent_ll, st.child_ll)
            + log_q_rev_minus_fwd
        )
        u = jax.random.uniform(k_acc, batchN)
        apply = active & (u <= jnp.exp(jnp.minimum(log_alpha, 0.0)))

        a_px = apply[..., None]
        new_state = KernelState(
            locs=_apply_slot_update(locs, onehot, loc_prop, apply),
            fluxes=_apply_slot_update(fluxes, onehot, f_prop, apply),
            rate=jnp.where(a_px, rate_prop, st.rate),
            child_rate=(
                None
                if st.child_rate is None
                else jnp.where(a_px, child_rate_prop, st.child_rate)
            ),
            parent_ll=jnp.where(apply, parent_ll_prop, st.parent_ll),
            child_ll=(
                None
                if st.child_ll is None
                else jnp.where(apply, child_ll_prop, st.child_ll)
            ),
            logprior=jnp.where(apply, logprior_prop, st.logprior),
        )
        return new_state, apply

    keys = jax.random.split(key, num_sweeps)
    state, applied = jax.lax.scan(lambda st, k: sweep(st, k), state, keys)
    assert state.locs.shape == locs_shape
    # fraction of applied relocations, reduced like the kernels' acc_rate
    # (mean over sweeps then particles) so callers can blend diagnostics
    acc = applied.astype(jnp.float32).mean(0).mean(-1)
    return state, acc


def _flux_support(prior):
    """(lower, upper) bounds of the flux mark's support (+-inf when
    unbounded); used to validity-gate moves that construct fluxes
    arithmetically instead of sampling them from the prior."""
    if prior.flux is None:
        return jnp.asarray(-jnp.inf), jnp.asarray(jnp.inf)
    lo = prior.flux.support_lower
    hi = getattr(prior.flux, "support_upper", jnp.asarray(jnp.inf))
    return jnp.asarray(lo), jnp.asarray(hi)


def pair_redistribute_sweeps(key, ctx: TargetContext, counts,
                             state: KernelState, num_sweeps: int,
                             select_scale: float = 2.0,
                             displace_scale: float = 1.0,
                             flux_conc: float = 1.0):
    """Coordinated two-star move: virtually merge a nearby pair and
    re-split it with a fresh flux fraction and displacement.

    The documented failure mode of single-component kernels on crowded
    tiles is the *split mode*: one bright star explained as two
    overlapping stars (or vice versa), where no single-star move can
    escape — moving either partner alone leaves residual flux
    unexplained, and a death (in RJ samplers) is equally blocked
    (docs/results/RESULTS.md, MCMC-anchor study; the reference mutates
    with the same single-site kernel, kernel.py:7-130, and simply mixes
    slowly). This move updates BOTH stars at once while conserving their
    total flux and flux-weighted centroid — exactly the combination the
    likelihood pins down — so the blocked directions (flux transfer,
    separation) are proposed directly. Counts never change, so the move
    is valid inside CS-SMC's fixed-count strata and the aggregation
    bridge.

    Proposal (per sweep, per catalog):

    1. pick slot ``i`` uniformly over the occupied prefix; pick ``j``
       among other occupied slots with probability
       ``softmax(-|l_i - l_k|^2 / (2 select_scale^2))`` — overlap is
       what the move fixes, so nearby pairs are preferred, and the
       selection ratio is corrected exactly in the MH acceptance;
    2. with ``f = f_i + f_j`` and centroid
       ``c = (f_i l_i + f_j l_j) / f``, draw ``u ~ Beta(a, a)``
       (``a = flux_conc``; 1 = uniform) and
       ``d ~ N(0, displace_scale^2 I_2)``, and set
       ``f_i' = u f``, ``f_j' = (1-u) f``,
       ``l_i' = c + (1-u) d``, ``l_j' = c - u d``.

    The map conserves ``(f, c)``; in coordinates
    ``(f, u deg, c, d deg, u, d)`` (where ``u deg = f_i/f`` and
    ``d deg = l_i - l_j`` are the current fraction/displacement) it is
    the pure swap ``(u <-> u deg, d <-> d deg)``, so the Jacobian is
    exactly 1 and the reverse move's auxiliary draws are
    ``u* = f_i/f``, ``d* = l_i - l_j``. The acceptance ratio is the
    tempered target ratio times the pair-selection ratio (evaluated at
    new vs old locations) times ``q(u*) q(d*) / q(u) q(d)``. Moves whose
    children leave the location box or the flux support are rejected
    outright (the uniform location prior and the flux support make the
    target zero there).
    """
    prior = ctx.prior
    eff = jnp.asarray(ctx.model.adu_per_nmgy)
    M = state.fluxes.shape[-1]
    batchN = counts.shape
    locs_shape = state.locs.shape
    flux_lo, flux_hi = _flux_support(prior)
    inv2s2 = 1.0 / (2.0 * float(select_scale) ** 2)
    neg = jnp.finfo(jnp.float32).min
    a_conc = float(flux_conc)
    occupied = jnp.arange(M) < counts[..., None]  # [..., N, M]

    def pair_logits(all_locs, loc_a, exclude):
        """Selection logits from star ``a`` to every other occupied slot."""
        d2 = ((all_locs - loc_a[..., None, :]) ** 2).sum(-1)  # [..., N, M]
        return jnp.where(occupied & ~exclude, -d2 * inv2s2, neg)

    def log_beta_pdf(u):
        if a_conc == 1.0:
            return jnp.zeros_like(u)
        from jax.scipy.stats import beta as beta_dist

        return beta_dist.logpdf(u, a_conc, a_conc)

    def sweep(st: KernelState, k):
        locs, fluxes = st.locs, st.fluxes
        k_i, k_j, k_u, k_d, k_acc = jax.random.split(k, 5)
        active = counts >= 2

        # slot i: uniform over the occupied prefix
        u_i = jax.random.uniform(k_i, batchN)
        i = jnp.clip(
            jnp.floor(u_i * counts).astype(jnp.int32), 0, counts - 1
        )
        onehot_i = jnp.arange(M) == i[..., None]
        loc_i = _take_slot(locs, onehot_i)
        f_i = _take_slot(fluxes, onehot_i)

        # slot j: proximity softmax via Gumbel-max
        logits_i = pair_logits(locs, loc_i, onehot_i)
        g = jax.random.gumbel(k_j, logits_i.shape)
        j = jnp.argmax(logits_i + g, axis=-1).astype(jnp.int32)
        onehot_j = jnp.arange(M) == j[..., None]
        loc_j = _take_slot(locs, onehot_j)
        f_j = _take_slot(fluxes, onehot_j)

        # forward selection: log[p(i,j) + p(j,i)] (the 1/n factor cancels
        # between forward and reverse). w_ij = w_ji, so this is
        # log w_ij + log(1/Z_i + 1/Z_j).
        logits_j = pair_logits(locs, loc_j, onehot_j)
        logZ_i = jax.scipy.special.logsumexp(logits_i, axis=-1)
        logZ_j = jax.scipy.special.logsumexp(logits_j, axis=-1)
        log_w = -((loc_i - loc_j) ** 2).sum(-1) * inv2s2
        log_sel_fwd = log_w + jnp.logaddexp(-logZ_i, -logZ_j)

        # merge invariants and fresh split
        f_tot = f_i + f_j
        safe_tot = jnp.maximum(f_tot, jnp.finfo(jnp.float32).tiny)
        cent = (
            f_i[..., None] * loc_i + f_j[..., None] * loc_j
        ) / safe_tot[..., None]
        u = jax.random.beta(k_u, a_conc, a_conc, batchN)
        d = displace_scale * jax.random.normal(k_d, batchN + (2,))
        f_i_new = u * f_tot
        f_j_new = (1.0 - u) * f_tot
        loc_i_new = cent + (1.0 - u)[..., None] * d
        loc_j_new = cent - u[..., None] * d

        # reverse auxiliaries recovering the current state
        u_star = f_i / safe_tot
        d_star = loc_i - loc_j

        def in_box(loc):
            return (
                (loc >= prior.loc_low) & (loc <= prior.loc_high)
            ).all(-1)

        valid = (
            active
            & (f_tot > 0)
            & in_box(loc_i_new)
            & in_box(loc_j_new)
            & (f_i_new >= flux_lo)
            & (f_i_new <= flux_hi)
            & (f_j_new >= flux_lo)
            & (f_j_new <= flux_hi)
            & (u_star > 0.0)
            & (u_star < 1.0)
        )

        # reverse selection at the proposed locations
        always = jnp.ones(batchN, bool)
        locs_prop = _apply_slot_update(locs, onehot_i, loc_i_new, always)
        locs_prop = _apply_slot_update(locs_prop, onehot_j, loc_j_new, always)
        logits_i_rev = pair_logits(locs_prop, loc_i_new, onehot_i)
        logits_j_rev = pair_logits(locs_prop, loc_j_new, onehot_j)
        logZ_i_rev = jax.scipy.special.logsumexp(logits_i_rev, axis=-1)
        logZ_j_rev = jax.scipy.special.logsumexp(logits_j_rev, axis=-1)
        log_w_rev = -(d**2).sum(-1) * inv2s2  # |l_i' - l_j'| = |d|
        log_sel_rev = log_w_rev + jnp.logaddexp(-logZ_i_rev, -logZ_j_rev)

        # auxiliary-density ratio (Jacobian is exactly 1)
        eps = 1e-6
        u_star_safe = jnp.where(valid, jnp.clip(u_star, eps, 1 - eps), 0.5)
        u_safe = jnp.clip(u, eps, 1 - eps)
        log_q_aux = (
            log_beta_pdf(u_star_safe)
            - log_beta_pdf(u_safe)
            + ((d**2).sum(-1) - (d_star**2).sum(-1))
            / (2.0 * float(displace_scale) ** 2)
        )

        # flux-prior delta (the uniform location terms are constant
        # inside the box; out-of-box is handled by ``valid``)
        if prior.flux is not None:
            ref = prior.flux.reference_point
            sf_i = jnp.where(valid, f_i, ref)
            sf_j = jnp.where(valid, f_j, ref)
            sf_i_new = jnp.where(valid, f_i_new, ref)
            sf_j_new = jnp.where(valid, f_j_new, ref)
            lp_delta = jnp.where(
                valid,
                prior.flux.log_prob(sf_i_new)
                + prior.flux.log_prob(sf_j_new)
                - prior.flux.log_prob(sf_i)
                - prior.flux.log_prob(sf_j),
                0.0,
            )
        else:
            lp_delta = jnp.zeros(batchN)

        # incremental rate update: four single-star renders
        side_i = (
            _take_slot(ctx.child_slot_side, onehot_i)
            if ctx.child_slot_side is not None
            else None
        )
        side_j = (
            _take_slot(ctx.child_slot_side, onehot_j)
            if ctx.child_slot_side is not None
            else None
        )
        img_i_old, child_i_old = ctx.star_images(loc_i, side_i)
        img_j_old, child_j_old = ctx.star_images(loc_j, side_j)
        img_i_new, child_i_new = ctx.star_images(loc_i_new, side_i)
        img_j_new, child_j_new = ctx.star_images(loc_j_new, side_j)
        v = valid[..., None]
        dparent = eff * (
            f_i_new[..., None] * img_i_new
            + f_j_new[..., None] * img_j_new
            - f_i[..., None] * img_i_old
            - f_j[..., None] * img_j_old
        )
        rate_prop = st.rate + jnp.where(v, dparent, 0.0)
        if st.child_rate is not None:
            dchild = eff * (
                f_i_new[..., None] * child_i_new
                + f_j_new[..., None] * child_j_new
                - f_i[..., None] * child_i_old
                - f_j[..., None] * child_j_old
            )
            child_rate_prop = st.child_rate + jnp.where(v, dchild, 0.0)
        else:
            child_rate_prop = None

        parent_ll_prop, child_ll_prop = ctx.loglik_terms(
            rate_prop, child_rate_prop
        )
        logprior_prop = st.logprior + lp_delta

        log_alpha = (
            ctx.combine(logprior_prop, parent_ll_prop, child_ll_prop)
            - ctx.combine(st.logprior, st.parent_ll, st.child_ll)
            + log_sel_rev
            - log_sel_fwd
            + log_q_aux
        )
        u_acc = jax.random.uniform(k_acc, batchN)
        apply = valid & (u_acc <= jnp.exp(jnp.minimum(log_alpha, 0.0)))

        a_px = apply[..., None]
        locs_out = _apply_slot_update(locs, onehot_i, loc_i_new, apply)
        locs_out = _apply_slot_update(locs_out, onehot_j, loc_j_new, apply)
        fluxes_out = _apply_slot_update(fluxes, onehot_i, f_i_new, apply)
        fluxes_out = _apply_slot_update(fluxes_out, onehot_j, f_j_new, apply)
        new_state = KernelState(
            locs=locs_out,
            fluxes=fluxes_out,
            rate=jnp.where(a_px, rate_prop, st.rate),
            child_rate=(
                None
                if st.child_rate is None
                else jnp.where(a_px, child_rate_prop, st.child_rate)
            ),
            parent_ll=jnp.where(apply, parent_ll_prop, st.parent_ll),
            child_ll=(
                None
                if st.child_ll is None
                else jnp.where(apply, child_ll_prop, st.child_ll)
            ),
            logprior=jnp.where(apply, logprior_prop, st.logprior),
        )
        return new_state, apply

    keys = jax.random.split(key, num_sweeps)
    state, applied = jax.lax.scan(lambda st, k: sweep(st, k), state, keys)
    assert state.locs.shape == locs_shape
    acc = applied.astype(jnp.float32).mean(0).mean(-1)
    return state, acc


@struct.dataclass
class SingleComponentMALA:
    """Single-component Metropolis-adjusted Langevin.

    Parity: kernel.py:133-275 — truncated-normal proposals whose means are
    drifted by ``x + (step^2 / 2) * grad log target``, with the asymmetric
    proposal correction; gradients come from ``jax.grad`` of the incremental
    target instead of ``torch.autograd.grad`` of a full re-render.
    """

    num_iters: int = struct.field(pytree_node=False)
    locs_step: jax.Array = 0.05
    fluxes_step: jax.Array = 1.0
    fluxes_min: jax.Array = 0.0
    fluxes_max: jax.Array = 1e6
    # "auto": fused Pallas sweep loop with ANALYTIC slot gradients on TPU
    # when the target supports it (ops/pallas_sweep.pallas_mala_sweeps);
    # "xla": always the jax.grad lax.scan path below.
    backend: str = struct.field(pytree_node=False, default="auto")
    # jsm2024 early-stop knob; see SingleComponentMH.sqjumpdist_tol
    # (run_smc_mala.py:59-68 uses the same tolerances).
    sqjumpdist_tol: float | None = struct.field(
        pytree_node=False, default=None
    )

    def _slot_target(self, ctx, base, active, loc, f, side=None):
        """Tempered log-target as a function of slot-j params only.

        ``base`` carries the slot-removed rate caches; differentiable in
        ``loc`` and ``f``.
        """
        rate_wo, child_rate_wo, logprior_wo = base
        eff = jnp.asarray(ctx.model.adu_per_nmgy)
        parent, child = ctx.star_images(loc, side)
        a = active[..., None]
        rate = rate_wo + jnp.where(a, eff * f[..., None] * parent, 0.0)
        child_rate = (
            None
            if child_rate_wo is None
            else child_rate_wo
            + jnp.where(a, eff * f[..., None] * child, 0.0)
        )
        parent_ll, child_ll = ctx.loglik_terms(rate, child_rate)
        if ctx.prior.flux is not None:
            ref = ctx.prior.flux.reference_point
            safe = jnp.where(active, f, ref)
            logprior = logprior_wo + jnp.where(
                active, ctx.prior.flux.log_prob(safe), 0.0
            )
        else:
            logprior = logprior_wo
        target = ctx.combine(logprior, parent_ll, child_ll)
        caches = (rate, child_rate, parent_ll, child_ll, logprior)
        return target.sum(), (target, caches)

    def sweep(self, key, ctx: TargetContext, counts, state: KernelState):
        locs, fluxes = state.locs, state.fluxes
        batchN = counts.shape
        M = fluxes.shape[-1]
        k_j, k_loc, k_flux, k_acc = jax.random.split(key, 4)

        # uniform over the occupied slot prefix (slots 0..count-1), not
        # all M padded slots: the reference proposes over every slot
        # (kernel.py:35-44), wasting (M-s)/M of each sweep on no-op
        # proposals. Occupied slots are exchangeable so this selection is
        # symmetric; the kernel stays exact for the same stratum target.
        u_j = jax.random.uniform(k_j, batchN)
        j = jnp.minimum(
            jnp.floor(u_j * counts).astype(jnp.int32), counts - 1
        )
        active = counts > 0
        onehot = jnp.arange(M) == j[..., None]  # [..., N, M]

        loc_j = _take_slot(locs, onehot)
        f_j = _take_slot(fluxes, onehot)

        # Remove slot j from the caches once; everything below is a function
        # of the slot parameters only.
        eff = jnp.asarray(ctx.model.adu_per_nmgy)
        side_j = (
            _take_slot(ctx.child_slot_side, onehot)
            if ctx.child_slot_side is not None
            else None
        )
        old_parent, old_child = ctx.star_images(loc_j, side_j)
        a = active[..., None]
        rate_wo = state.rate - jnp.where(
            a, eff * f_j[..., None] * old_parent, 0.0
        )
        child_rate_wo = (
            None
            if state.child_rate is None
            else state.child_rate
            - jnp.where(a, eff * f_j[..., None] * old_child, 0.0)
        )
        if ctx.prior.flux is not None:
            ref = ctx.prior.flux.reference_point
            safe = jnp.where(active, f_j, ref)
            logprior_wo = state.logprior - jnp.where(
                active, ctx.prior.flux.log_prob(safe), 0.0
            )
        else:
            logprior_wo = state.logprior
        base = (rate_wo, child_rate_wo, logprior_wo)

        grad_fn = jax.grad(self._slot_target, argnums=(3, 4), has_aux=True)

        loc_low, loc_high = ctx.prior.loc_low, ctx.prior.loc_high
        f_lo = _effective_flux_floor(self.fluxes_min, ctx.prior)

        # Forward drift + proposal.
        (gl, gf), (target_old, _) = grad_fn(
            ctx, base, active, loc_j, f_j, side_j
        )
        loc_qmean = loc_j + 0.5 * self.locs_step**2 * gl
        f_qmean = f_j + 0.5 * self.fluxes_step**2 * gf
        loc_prop = truncated_normal_sample(
            k_loc, loc_qmean, self.locs_step, loc_low, loc_high
        )
        f_prop = truncated_normal_sample(
            k_flux, f_qmean, self.fluxes_step, f_lo, self.fluxes_max
        )

        # Reverse drift at the proposal.
        (glp, gfp), (target_new, caches_new) = grad_fn(
            ctx, base, active, loc_prop, f_prop, side_j
        )
        loc_qmean_rev = loc_prop + 0.5 * self.locs_step**2 * glp
        f_qmean_rev = f_prop + 0.5 * self.fluxes_step**2 * gfp

        log_q_fwd = truncated_normal_log_prob(
            loc_prop, loc_qmean, self.locs_step, loc_low, loc_high
        ).sum(-1) + truncated_normal_log_prob(
            f_prop, f_qmean, self.fluxes_step, f_lo, self.fluxes_max
        )
        log_q_rev = truncated_normal_log_prob(
            loc_j, loc_qmean_rev, self.locs_step, loc_low, loc_high
        ).sum(-1) + truncated_normal_log_prob(
            f_j, f_qmean_rev, self.fluxes_step, f_lo, self.fluxes_max
        )

        log_alpha = (target_new + log_q_rev) - (target_old + log_q_fwd)
        u = jax.random.uniform(k_acc, batchN)
        accept = u <= jnp.exp(jnp.minimum(log_alpha, 0.0))
        apply = accept & active

        rate_new, child_rate_new, parent_ll_new, child_ll_new, logprior_new = (
            caches_new
        )
        new_locs = _apply_slot_update(locs, onehot, loc_prop, apply)
        new_fluxes = _apply_slot_update(fluxes, onehot, f_prop, apply)
        a_px = apply[..., None]
        new_state = KernelState(
            locs=new_locs,
            fluxes=new_fluxes,
            rate=jnp.where(a_px, rate_new, state.rate),
            child_rate=(
                None
                if state.child_rate is None
                else jnp.where(a_px, child_rate_new, state.child_rate)
            ),
            parent_ll=jnp.where(apply, parent_ll_new, state.parent_ll),
            child_ll=(
                None
                if state.child_ll is None
                else jnp.where(apply, child_ll_new, state.child_ll)
            ),
            logprior=jnp.where(apply, logprior_new, state.logprior),
        )
        return new_state, apply

    def run(self, key, ctx: TargetContext, counts, locs, fluxes):
        state = init_kernel_state(ctx, counts, locs, fluxes)
        return self.run_from_state(key, ctx, counts, state)

    def run_from_state(self, key, ctx: TargetContext, counts,
                       state: KernelState):
        if self.sqjumpdist_tol is not None:
            if self.backend == "pallas":
                raise NotImplementedError(
                    "sqjumpdist_tol early stopping needs a data-dependent "
                    "trip count — use backend='auto' or 'xla'"
                )
            return _run_sweeps_early_stop(self, key, ctx, counts, state)

        if self.backend != "xla":
            from smcdet_tpu.ops import pallas_sweep

            if pallas_sweep.supports_mala(ctx, self):
                locs2, fluxes2, rate, pll, lp, acc, crate, cll = (
                    pallas_sweep.pallas_mala_sweeps(
                        key, ctx, self, counts, state.locs, state.fluxes,
                        state.rate, state.parent_ll, state.logprior,
                        child_rate=state.child_rate,
                        child_ll=state.child_ll,
                    )
                )
                state = KernelState(
                    locs=locs2,
                    fluxes=fluxes2,
                    rate=rate,
                    child_rate=crate,
                    parent_ll=pll,
                    child_ll=cll,
                    logprior=lp,
                )
                return state, acc.mean(-1)
            if self.backend == "pallas":
                raise NotImplementedError(
                    "pallas backend requested but this target configuration "
                    "is not supported by the fused MALA kernel"
                )

        def body(carry, k):
            st, acc_n = carry
            st, accept = self.sweep(k, ctx, counts, st)
            return (st, acc_n + accept.astype(jnp.float32)), None

        # mean applied fraction over ALL sweeps (matching the Pallas
        # path's accounting), not just the final sweep's
        keys = jax.random.split(key, self.num_iters)
        acc0 = jnp.zeros(counts.shape, dtype=jnp.float32)
        (state, acc_n), _ = jax.lax.scan(body, (state, acc0), keys)
        acc_rate = (acc_n / self.num_iters).mean(-1)
        return state, acc_rate
