"""Divide-and-conquer aggregation of per-tile posteriors (layer L3).

TPU-native re-design of /root/reference/smcdet/aggregate.py:8-639: merge
per-tile CS-SMC posteriors up a binary tree with ``2*log2(num_tiles_h)``
levels alternating the height/width axes, re-targeting each merged pair
from the product-of-children posterior to the joint-parent posterior with a
second tempered-SMC bridge (target ``logprior + (1-tau)*sum child_loglik +
tau*parent_loglik``, aggregate.py:105-130).

Key architectural changes vs the reference:

- **Dense strata.** The reference sorts catalogs by count and keeps ragged
  per-tile ``num_catalogs_per_count`` lists, looping over tiles and strata
  in python for tempering/weights/resampling (aggregate.py:145-171,
  :424-521). Here the stratum of particle ``n`` is just its count
  ``c_n``; per-stratum softmax/ESS/logZ are masked reductions over a dense
  ``[Th, Tw, C, N]`` membership mask, and within-stratum resampling draws a
  full index table per stratum and selects row ``c_n`` — no ragged splits,
  no host loops.
- **No unjoin in the hot loop.** The bridge target's child term is
  evaluated on the *joined* image: because the child tiles partition the
  parent pixels and integer tile shifts commute with the PSF patch floor,
  a star's child-tile render equals its parent render masked to its own
  side of the boundary. The mutation kernel therefore reuses its
  incremental parent render with a side mask (inference/kernels.py
  ``TargetContext.child_model``/``child_side_mask``) instead of the
  reference's per-iteration unjoin + re-render (aggregate.py:569-577).
- **On-device everything**: adaptive per-stratum tempering is batched
  bisection (ops/tempering.py) instead of per-(tile, stratum) host brentq
  (aggregate.py:145-171); the per-count normalising-constant merge is a
  pair of one-hot histogram contractions (aggregate.py:362-422's nested
  unique()/pmf loops).
- Each level doubles the tile dims and the object-slot axis, so there is
  one compilation per level (``log2(T)`` compiles), as SURVEY.md §7
  anticipates.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from smcdet_tpu.inference.kernels import TargetContext
from smcdet_tpu.models.priors import PoissonCounts, UniformCounts
from smcdet_tpu.ops.catalogs import compact_catalog, prune_catalog, slot_mask
from smcdet_tpu.ops.resampling import (
    gather_particles,
    resample_indices,
    stratified_indices,
)
from smcdet_tpu.ops.tempering import solve_tempering_step

__all__ = ["AggregateConfig", "AggregateState", "Aggregate"]

_NEG = -1e30


@struct.dataclass
class AggregateConfig:
    ess_threshold_prop: float = struct.field(pytree_node=False, default=0.5)
    resample_method: str = struct.field(
        pytree_node=False, default="multinomial"
    )
    flux_detection_threshold: float = 0.0
    max_smc_iters: int = struct.field(pytree_node=False, default=100)
    # Cap on the object-slot axis as it doubles per level (None = no cap).
    # WARNING: a cap below the children's joint counts truncates real
    # stars out of the merged catalog — the parent target then cannot
    # explain their photons at ANY temperature (truncated stars are not
    # ghosted), so the bridge exits at the iteration cap biased. Only cap
    # when the posterior count support is confidently below it.
    max_objects_cap: int | None = struct.field(pytree_node=False, default=None)
    # Prior-draw relocation sweeps appended to each bridge mutation
    # (kernels.relocate_sweeps): lets a source stuck on a tile
    # corner/boundary jump across the merge seam in one move. 0 disables.
    relocate_sweeps: int = struct.field(pytree_node=False, default=8)
    # Coordinated two-star pair-redistribute sweeps appended to each
    # bridge mutation (kernels.pair_redistribute_sweeps): flux transfer +
    # re-separation of a nearby pair, the move the hardest merges need
    # when a source split across the seam must be consolidated (the
    # single-site kernel and the prior-draw relocation can each move only
    # one partner, leaving residual flux that blocks the move). 0 disables.
    pair_sweeps: int = struct.field(pytree_node=False, default=0)


class AggregateState(NamedTuple):
    """Particle system at one tree level, grid layout ``[Th, Tw, ...]``."""

    data: jax.Array  # [Th, Tw, H, W]
    counts: jax.Array  # [Th, Tw, N] i32
    locs: jax.Array  # [Th, Tw, N, M, 2]
    fluxes: jax.Array  # [Th, Tw, N, M]
    weights: jax.Array  # [Th, Tw, N] flat posterior weights
    log_z: jax.Array  # [Th, Tw, C] per-count log normalising constant


def expand_prior(prior, new_h, new_w, new_max_objects):
    """Prior for the joined tile: doubled dims, grown slot axis, count-prior
    rate rescaled with the padded area (the reference's
    ``Prior.update_attrs()`` after mutating ``image_height``,
    aggregate.py:236-242)."""
    counts = prior.counts
    if isinstance(counts, PoissonCounts):
        old_area = (prior.image_height + 2 * prior.pad) * (
            prior.image_width + 2 * prior.pad
        )
        new_area = (new_h + 2 * prior.pad) * (new_w + 2 * prior.pad)
        counts = PoissonCounts(rate=counts.rate * (new_area / old_area))
    elif isinstance(counts, UniformCounts):
        # grow the support with the slot axis: joint counts up to 2M are
        # legal after a merge; keeping high == the old max would give them
        # -inf count-prior mass and NaN-freeze those particles' mutations
        counts = UniformCounts(low=counts.low, high=new_max_objects)
    return prior.replace(
        image_height=new_h,
        image_width=new_w,
        max_objects=new_max_objects,
        counts=counts,
    )


def _stratum_mask(counts, num_strata: int):
    """``[..., C, N]`` bool: particle n belongs to stratum ``counts[n]``."""
    return counts[..., None, :] == jnp.arange(num_strata)[:, None]


def _member_max(x, mask):
    """Masked max over the particle axis: ``[..., N]``, ``[..., C, N]`` ->
    ``[..., C]`` (empty strata -> _NEG)."""
    return jnp.where(mask, x[..., None, :], _NEG).max(-1)


def _side_mask_fn(axis: int, boundary: int, height: int, width: int):
    """Pixel mask assigning each star's render to its own child tile.

    A star at parent coords belongs to child 1 iff its axis coordinate is
    ``<= boundary`` (the reference unjoin rule, aggregate.py:271-273); its
    child render equals the parent render restricted to that side's pixels
    (integer shifts commute with the patch floor, so masking is exact).
    """

    def side_mask(loc):
        # flat-pixel mask [..., H*W] (hot paths carry pixels flat; see
        # ImageModel.star_image_flat)
        on_side1 = loc[..., axis] <= boundary  # [...]
        p = jnp.arange(height * width)
        coord = p // width if axis == 0 else p % width
        pix = coord < boundary  # [HW]
        return jnp.where(on_side1[..., None], pix, ~pix)  # [..., HW]

    # structural description for the fused Pallas bridge kernel
    side_mask.axis = axis
    side_mask.boundary = boundary
    return side_mask


# ----------------------------------------------------------------------
# Level step: merge + bridge. Jitted once per level (shapes change).
# ----------------------------------------------------------------------
def _merge(key, state: AggregateState, axis: int, dims, M_new: int, cfg,
           model_new=None):
    """Resample, dedup the shared-pad overlap, join tile pairs, and merge
    the per-count normalising constants (aggregate.py:347-422).

    Besides the merged state, returns the per-slot origin tags (1 = the
    even pair member sampled this star) and the ghost child rate — the
    summed origin-window renders of the dedup-dropped stars. Together
    they make the bridge's tau=0 target the *exact* product of the child
    posteriors the particles were drawn from: a dropped bright star near
    the seam otherwise leaves photons no child term can explain, a
    particle-dependent mismatch of up to ~1e6 nats that jams the
    adaptive tempering at deltas ~1e-5 (the reference's location-based
    unjoin, aggregate.py:271-273, has the identical gap; its
    divide-and-conquer notebook only visualizes the scenario)."""
    Th, Tw, H, W = dims
    N = state.counts.shape[-1]
    M = state.fluxes.shape[-1]
    C_old = state.log_z.shape[-1]
    dim_axis = H if axis == 0 else W

    # 1. resample to uniform weights (aggregate.py:350-353)
    idx = resample_indices(key, state.weights, N, cfg.resample_method)
    counts_r, locs_r, fluxes_r = gather_particles(
        idx, state.counts, state.locs, state.fluxes, particle_axis=2
    )

    # 2. drop sources from the pair overlap (aggregate.py:189-215): the
    # even member keeps sources strictly inside its own region
    # (coord < dim), the odd member keeps coord > 0; each drops what its
    # sibling models.
    active = slot_mask(counts_r, M)
    coord = locs_r[..., axis]
    grid_idx = jnp.arange(Th)[:, None] if axis == 0 else jnp.arange(Tw)[None, :]
    is_even = (grid_idx % 2 == 0)[..., None, None]  # [Th, Tw, 1, 1]
    keep = active & jnp.where(is_even, coord < dim_axis, coord > 0.0)
    counts_d, locs_d, fluxes_d = compact_catalog(locs_r, fluxes_r, keep)

    # 2b. ghost child rate: render each dropped star into its origin
    # child's window, in parent coordinates (even member's local frame is
    # the parent's side-1 frame; the odd member shifts by dim_axis).
    dropped = active & ~keep
    shift_vec = jnp.zeros(2).at[axis].set(float(dim_axis))
    locs_parent = locs_r + jnp.where(is_even[..., None], 0.0, 1.0) * shift_vec
    eff = jnp.asarray(model_new.adu_per_nmgy)
    HW_new = model_new.height * model_new.width
    p = jnp.arange(HW_new)
    pcoord = p // model_new.width if axis == 0 else p % model_new.width
    even_pix = pcoord < dim_axis  # [HW_new]

    def ghost_step(carry, m):
        loc_m = jax.lax.dynamic_index_in_dim(
            locs_parent, m, axis=-2, keepdims=False
        )
        f_m = jax.lax.dynamic_index_in_dim(fluxes_r, m, axis=-1,
                                           keepdims=False)
        d_m = jax.lax.dynamic_index_in_dim(dropped, m, axis=-1,
                                           keepdims=False)
        img = model_new.star_image_flat(loc_m)  # [Th, Tw, N, HW_new]
        window = jnp.where(is_even, even_pix, ~even_pix)  # [Th, Tw, 1, HW]
        contrib = jnp.where(
            d_m[..., None], eff * f_m[..., None] * img * window, 0.0
        )
        return carry + contrib, None

    ghost0 = jnp.zeros(counts_r.shape + (HW_new,))
    ghost_full, _ = jax.lax.scan(ghost_step, ghost0, jnp.arange(M), length=M)
    # pair the members' ghosts: merged ghost = even member's + odd member's

    # 3. join pairs along `axis` (aggregate.py:217-263)
    if axis == 0:
        d = state.data.reshape(Th // 2, 2, Tw, H, W)
        data_new = jnp.concatenate([d[:, 0], d[:, 1]], axis=-2)
        even = (slice(None, None, 2), slice(None))
        odd = (slice(1, None, 2), slice(None))
    else:
        d = state.data.reshape(Th, Tw // 2, 2, H, W)
        data_new = jnp.concatenate([d[:, :, 0], d[:, :, 1]], axis=-1)
        even = (slice(None), slice(None, None, 2))
        odd = (slice(None), slice(1, None, 2))

    c1, c2 = counts_d[even], counts_d[odd]
    l1, l2 = locs_d[even], locs_d[odd]
    f1, f2 = fluxes_d[even], fluxes_d[odd]
    shift = jnp.zeros(2).at[axis].set(float(dim_axis))
    l2 = l2 + shift  # inactive slots re-zeroed by the masked compaction
    joint_locs = jnp.concatenate([l1, l2], axis=-2)  # [th, tw, N, 2M, 2]
    joint_fluxes = jnp.concatenate([f1, f2], axis=-1)
    joint_keep = jnp.concatenate(
        [slot_mask(c1, M), slot_mask(c2, M)], axis=-1
    )
    joint_counts, joint_locs, joint_fluxes = compact_catalog(
        joint_locs, joint_fluxes, joint_keep
    )
    joint_locs = joint_locs[..., :M_new, :]
    joint_fluxes = joint_fluxes[..., :M_new]
    joint_counts = jnp.minimum(joint_counts, M_new)

    # per-slot origin tags: the stable compaction keeps the even member's
    # c1 stars first, then the odd member's c2
    slot_side = (jnp.arange(M_new) < c1[..., None]).astype(jnp.float32)
    ghost_rate = ghost_full[even] + ghost_full[odd]

    # 4. per-count normalising-constant merge (aggregate.py:362-422):
    # p_hat(x_child | s_joint = j) = sum_k p_hat(x_child | s_child = k)
    #   * q_hat(s_child = k | s_joint = j), with q_hat the empirical
    # conditional pmf of the paired resampled catalogs — two one-hot
    # histogram contractions instead of nested unique()/mean() loops.
    C_new = M_new + 1
    oh_joint = (
        joint_counts[..., None] == jnp.arange(C_new)
    ).astype(jnp.float32)  # [th, tw, N, Cj]
    oh_child = (
        counts_r[..., None] == jnp.arange(C_old)
    ).astype(jnp.float32)  # [Th, Tw, N, Ck]
    n_joint = oh_joint.sum(-2)  # [th, tw, Cj]

    def child_term(oh_c, log_z_c):
        # counts[joint==j & child==k] -> conditional pmf -> logsumexp merge
        hist = jnp.einsum("...nj,...nk->...jk", oh_joint, oh_c)
        pmf = hist / jnp.maximum(n_joint[..., None], 1.0)
        log_pmf = jnp.where(pmf > 0, jnp.log(jnp.maximum(pmf, 1e-37)), _NEG)
        return jax.scipy.special.logsumexp(
            log_z_c[..., None, :] + log_pmf, axis=-1
        )  # [th, tw, Cj]

    lz_even, lz_odd = state.log_z[even], state.log_z[odd]
    log_z_new = child_term(oh_child[even], lz_even) + child_term(
        oh_child[odd], lz_odd
    )
    # strata with no catalogs can never be sampled
    log_z_new = jnp.where(n_joint > 0, log_z_new, _NEG)

    merged = AggregateState(
        data=data_new,
        counts=joint_counts,
        locs=joint_locs,
        fluxes=joint_fluxes,
        weights=jnp.full(joint_counts.shape, 1.0 / N),
        log_z=log_z_new,
    )
    return merged, slot_side, ghost_rate


class _BridgeCarry(NamedTuple):
    key: jax.Array
    locs: jax.Array
    fluxes: jax.Array
    slot_side: jax.Array  # [Th, Tw, N, M] origin tags (ride resampling)
    ghost_rate: jax.Array  # [Th, Tw, N, HW] frozen dropped-star renders
    loglik_diff: jax.Array  # [Th, Tw, N] parent_ll - child_ll
    weights_ic: jax.Array  # [Th, Tw, N] within-stratum weights
    log_z: jax.Array  # [Th, Tw, C]
    temperature: jax.Array  # [Th, Tw]
    acc_rate: jax.Array  # [Th, Tw]
    iteration: jax.Array


def _loglik_diff(ctx, locs, fluxes):
    rate, child_rate = ctx.init_rates(locs, fluxes)
    parent_ll, child_ll = ctx.loglik_terms(rate, child_rate)
    return parent_ll - child_ll


def _temper_reweight(carry: _BridgeCarry, counts_idx, smask, n_strat, cfg):
    """Per-stratum adaptive tempering + weight/logZ update
    (aggregate.py:140-174, :439-483) as dense masked reductions.

    ``counts_idx`` [Th,Tw,N] is each particle's stratum (== its count);
    per-particle stratum quantities are one ``take_along_axis`` away.
    """
    done = carry.temperature >= 1.0
    ld = carry.loglik_diff
    masked_ld = jnp.where(smask, ld[..., None, :], _NEG)  # [Th,Tw,C,N]
    ess_target = cfg.ess_threshold_prop * n_strat  # [Th,Tw,C]
    delta_c = solve_tempering_step(
        masked_ld, carry.temperature[..., None], ess_target
    )
    delta = jnp.where(done, 0.0, delta_c.min(-1))  # [Th,Tw]
    temperature = jnp.clip(carry.temperature + delta, 0.0, 1.0)

    w_log = delta[..., None] * ld  # [Th,Tw,N]
    m_c = _member_max(w_log, smask)  # [Th,Tw,C]
    m_n = jnp.take_along_axis(m_c, counts_idx, axis=-1)  # [Th,Tw,N]
    shifted = jnp.exp(w_log - m_n)  # [Th,Tw,N]
    sum_c = jnp.where(smask, shifted[..., None, :], 0.0).sum(-1)  # [Th,Tw,C]
    sum_n = jnp.take_along_axis(sum_c, counts_idx, axis=-1)
    weights_ic = shifted / jnp.maximum(sum_n, 1e-37)

    occupied = n_strat > 0
    lz_inc = jnp.where(
        occupied & ~done[..., None],
        jnp.log(jnp.maximum(sum_c, 1e-37) / jnp.maximum(n_strat, 1.0)) + m_c,
        0.0,
    )
    log_z = carry.log_z + lz_inc

    keep = done[..., None]
    weights_ic = jnp.where(keep, carry.weights_ic, weights_ic)
    return carry._replace(
        weights_ic=weights_ic,
        log_z=log_z,
        temperature=temperature,
    )


def _run_level(key, state: AggregateState, prior, model, kernel, cfg,
               axis: int, dims):
    """One full tree level: merge + tempered-SMC bridge
    (aggregate.py:523-593)."""
    Th, Tw, H, W = dims
    N = state.counts.shape[-1]
    M = state.fluxes.shape[-1]
    M_new = 2 * M if cfg.max_objects_cap is None else min(
        2 * M, cfg.max_objects_cap
    )
    C_new = M_new + 1
    H_new, W_new = (2 * H, W) if axis == 0 else (H, 2 * W)
    dim_axis = H if axis == 0 else W

    prior_new = expand_prior(prior, H_new, W_new, M_new)
    model_new = model.replace(height=H_new, width=W_new)
    side_mask = _side_mask_fn(axis, dim_axis, H_new, W_new)

    key, k_merge = jax.random.split(key)
    state, slot_side0, ghost0 = _merge(
        k_merge, state, axis, dims, M_new, cfg, model_new=model_new
    )

    def make_ctx(temperature, slot_side, ghost_rate):
        return TargetContext(
            prior=prior_new,
            model=model_new,
            image=state.data[:, :, None],  # [Th,Tw,1,H,W] vs N
            temperature=temperature[..., None],  # [Th,Tw,1]
            child_model=model_new,
            child_side_mask=side_mask,
            child_slot_side=slot_side,
            child_ghost_rate=ghost_rate,
        )

    smask = _stratum_mask(state.counts, C_new)  # [Th,Tw,C,N]
    n_strat = smask.sum(-1).astype(jnp.float32)  # [Th,Tw,C]
    counts_idx = state.counts  # stratum of particle n IS its count

    temperature0 = jnp.zeros(state.counts.shape[:2])
    ld0 = _loglik_diff(
        make_ctx(temperature0, slot_side0, ghost0), state.locs, state.fluxes
    )

    carry = _BridgeCarry(
        key=key,
        locs=state.locs,
        fluxes=state.fluxes,
        slot_side=slot_side0,
        ghost_rate=ghost0,
        loglik_diff=ld0,
        weights_ic=jnp.full(state.counts.shape, 1.0 / N),
        log_z=state.log_z,
        temperature=temperature0,
        acc_rate=jnp.zeros(state.counts.shape[:2]),
        iteration=jnp.asarray(0, jnp.int32),
    )
    carry = _temper_reweight(carry, counts_idx, smask, n_strat, cfg)

    def cond(carry):
        return jnp.any(carry.temperature < 1.0) & (
            carry.iteration < cfg.max_smc_iters
        )

    def body(carry):
        key, k_res, k_mut, k_rel, k_pair = jax.random.split(carry.key, 5)
        done = carry.temperature >= 1.0

        # Within-stratum resampling (aggregate.py:485-521): stratum sizes
        # are preserved exactly, with no ragged splits. The systematic
        # variant runs the strided-grid construction on each stratum's
        # compacted CDF (ops/resampling.stratified_indices) — restoring
        # the tile-level sampler's variance reduction inside the bridge.
        idx = stratified_indices(
            k_res, carry.weights_ic, counts_idx, C_new, cfg.resample_method
        )  # [Th,Tw,N]: ancestor of n within stratum c_n
        locs_r, fluxes_r, ld_r, side_r, ghost_r = gather_particles(
            idx,
            carry.locs,
            carry.fluxes,
            carry.loglik_diff,
            carry.slot_side,
            carry.ghost_rate,
            particle_axis=2,
        )
        keep = done[..., None]
        locs = jnp.where(keep[..., None, None], carry.locs, locs_r)
        fluxes = jnp.where(keep[..., None], carry.fluxes, fluxes_r)
        ld = jnp.where(keep, carry.loglik_diff, ld_r)
        slot_side = jnp.where(keep[..., None], carry.slot_side, side_r)
        ghost = jnp.where(keep[..., None], carry.ghost_rate, ghost_r)
        weights_ic = jnp.where(keep, carry.weights_ic, 1.0 / N)

        # mutation with the bridge target
        ctx = make_ctx(carry.temperature, slot_side, ghost)
        kstate, acc = kernel.run(k_mut, ctx, state.counts, locs, fluxes)
        if cfg.relocate_sweeps:
            from smcdet_tpu.inference.kernels import relocate_sweeps

            kstate, acc_rel = relocate_sweeps(
                k_rel, ctx, state.counts, kstate, cfg.relocate_sweeps
            )
            # blend into the diagnostic so the cap warning's numbers
            # reflect ALL moves (prior-draw relocations often carry the
            # mixing when random-walk moves stall)
            n_mh = kernel.num_iters
            acc = (acc * n_mh + acc_rel * cfg.relocate_sweeps) / (
                n_mh + cfg.relocate_sweeps
            )
        if cfg.pair_sweeps:
            from smcdet_tpu.inference.kernels import (
                pair_redistribute_sweeps,
            )

            kstate, acc_pair = pair_redistribute_sweeps(
                k_pair, ctx, state.counts, kstate, cfg.pair_sweeps
            )
            n_prev = kernel.num_iters + cfg.relocate_sweeps
            acc = (acc * n_prev + acc_pair * cfg.pair_sweeps) / (
                n_prev + cfg.pair_sweeps
            )
        locs = jnp.where(keep[..., None, None], locs, kstate.locs)
        fluxes = jnp.where(keep[..., None], fluxes, kstate.fluxes)
        ld_new = kstate.parent_ll - kstate.child_ll
        ld = jnp.where(keep, ld, ld_new)

        carry = carry._replace(
            key=key,
            locs=locs,
            fluxes=fluxes,
            slot_side=slot_side,
            ghost_rate=ghost,
            loglik_diff=ld,
            weights_ic=weights_ic,
            acc_rate=jnp.where(done, carry.acc_rate, acc),
            iteration=carry.iteration + 1,
        )
        return _temper_reweight(carry, counts_idx, smask, n_strat, cfg)

    carry = jax.lax.while_loop(cond, body, carry)

    # flat weights = within-stratum weight x stratum probability
    count_pmf = jax.nn.softmax(carry.log_z, axis=-1)  # [Th,Tw,C]
    pmf_n = jnp.take_along_axis(count_pmf, counts_idx, axis=-1)
    flat_weights = carry.weights_ic * pmf_n
    flat_weights = flat_weights / jnp.maximum(
        flat_weights.sum(-1, keepdims=True), 1e-37
    )

    new_state = AggregateState(
        data=state.data,
        counts=state.counts,
        locs=carry.locs,
        fluxes=carry.fluxes,
        weights=flat_weights,
        log_z=carry.log_z,
    )
    diag = dict(
        temperature=carry.temperature,
        iterations=carry.iteration,
        acc_rate=carry.acc_rate,
    )
    return new_state, diag


class Aggregate:
    """User-facing wrapper mirroring the reference ``Aggregate`` API
    (aggregate.py:8-67): consume a finished sampler's tile posteriors plus
    the model objects, run the merge tree, expose posterior summaries."""

    def __init__(
        self,
        Prior,
        ImageModel,
        MutationKernel,
        data,
        counts,
        locs,
        fluxes,
        weights,
        log_normalizing_constant,
        flux_detection_threshold=0.0,
        resample_method="multinomial",
        ess_threshold_prop=0.5,
        max_smc_iters=100,
        max_objects_cap=None,
        relocate_sweeps=8,
        pair_sweeps=0,
    ):
        if resample_method not in {"multinomial", "systematic"}:
            raise ValueError(
                "resample_method must be either multinomial or systematic."
            )
        self.prior = Prior
        self.image_model = ImageModel
        self.kernel = MutationKernel
        self.config = AggregateConfig(
            ess_threshold_prop=ess_threshold_prop,
            resample_method=resample_method,
            flux_detection_threshold=flux_detection_threshold,
            max_smc_iters=max_smc_iters,
            max_objects_cap=max_objects_cap,
            relocate_sweeps=relocate_sweeps,
            pair_sweeps=pair_sweeps,
        )
        data = jnp.asarray(data, dtype=jnp.float32)
        self.num_tiles_h, self.num_tiles_w = data.shape[:2]
        if self.num_tiles_h != self.num_tiles_w:
            raise ValueError("aggregation requires a square tile grid")
        levels = 0
        t = self.num_tiles_h
        while t > 1:
            if t % 2:
                raise ValueError("tile grid side must be a power of two")
            t //= 2
            levels += 2
        self.num_aggregation_levels = levels

        self.state = AggregateState(
            data=data,
            counts=jnp.asarray(counts, dtype=jnp.int32),
            locs=jnp.asarray(locs, dtype=jnp.float32),
            fluxes=jnp.asarray(fluxes, dtype=jnp.float32),
            weights=jnp.asarray(weights, dtype=jnp.float32),
            log_z=jnp.asarray(log_normalizing_constant, dtype=jnp.float32),
        )
        self.diagnostics = []
        self.has_run = False

    @classmethod
    def from_smc(cls, sampler, result=None, **kwargs):
        """Build the aggregation stage from a finished ``SMCSampler``.

        Reshapes the sampler's flat ``[T, C*N]`` posterior (tiles row-major
        from ``tile_image``) into the ``[Th, Tw, ...]`` grid layout and
        reuses its prior/model/kernel. Extra kwargs override the
        aggregation config (fixes the reference's API skew where
        ``Aggregate`` expects per-count normalising constants the current
        ``SMCsampler`` no longer produces — SURVEY.md §1).
        """
        result = sampler.result if result is None else result
        th, tw = sampler.num_tiles_h, sampler.num_tiles_w
        td = sampler.tile_dim
        CN = result.counts.shape[-1]
        M = result.fluxes.shape[-1]
        # Aggregate indexes log_z by count value; the sampler's stratum
        # axis starts at min_objects — left-pad the unsupported counts.
        log_z = result.log_normalizing_constant
        if sampler.prior.min_objects > 0:
            pad = jnp.full(
                log_z.shape[:-1] + (sampler.prior.min_objects,), _NEG
            )
            log_z = jnp.concatenate([pad, log_z], axis=-1)
        kwargs.setdefault(
            "flux_detection_threshold",
            sampler.config.flux_detection_threshold,
        )
        kwargs.setdefault("resample_method", sampler.config.resample_method)
        kwargs.setdefault(
            "ess_threshold_prop", sampler.config.ess_threshold_prop
        )
        return cls(
            Prior=sampler.prior,
            ImageModel=sampler.image_model,
            MutationKernel=sampler.kernel,
            data=sampler.tiled_image.reshape(th, tw, td, td),
            counts=result.counts.reshape(th, tw, CN),
            locs=result.locs.reshape(th, tw, CN, M, 2),
            fluxes=result.fluxes.reshape(th, tw, CN, M),
            weights=result.weights.reshape(th, tw, CN),
            log_normalizing_constant=log_z.reshape(th, tw, -1),
            **kwargs,
        )

    @staticmethod
    def _level_sharding(devices, Th, Tw):
        """Sharding for one level's state: factor the device count over
        the two tile-grid axes, maximising the number of devices used;
        leftover devices replicate (the "spare" mesh axis). At the top of
        the tree (1x1 grid) this degrades to full replication.

        Every ``AggregateState`` leaf leads with ``[Th, Tw]``, so one spec
        covers the whole pytree. The pairwise join along a sharded axis
        becomes a neighbour exchange over ICI (SURVEY §7: ``log2(T)``
        reshard-on-pairs steps); joins along unsharded axes are fully
        local. XLA's sharding propagation inserts the collectives.
        """
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        n = len(devices)
        best_a, best_b = 1, 1
        for a in range(1, n + 1):
            if n % a or Th % a:
                continue
            for b in range(1, n // a + 1):
                if (n // a) % b or Tw % b:
                    continue
                if a * b > best_a * best_b:
                    best_a, best_b = a, b
        a, b = best_a, best_b
        mesh = Mesh(
            np.asarray(devices).reshape(a, b, n // (a * b)),
            ("th", "tw", "spare"),
        )
        return NamedSharding(mesh, P("th", "tw"))

    def run(self, key=None, verbose=False, devices=None):
        """Run the merge tree. ``devices``: optional device list/mesh — the
        tile grid shards over a 1-D mesh while it is large enough, with
        per-level resharding as the grid halves (see ``_level_sharding``);
        default single-device jit."""
        if key is None:
            key = jax.random.key(0)
        if devices is not None:
            from jax.sharding import Mesh

            if isinstance(devices, Mesh):
                devices = list(devices.devices.ravel())
            devices = list(devices)
        state = self.state
        Th, Tw = self.num_tiles_h, self.num_tiles_w
        H, W = state.data.shape[2], state.data.shape[3]
        for level in range(self.num_aggregation_levels):
            axis = level % 2
            key, k_level = jax.random.split(key)
            step = jax.jit(
                partial(
                    _run_level,
                    prior=self.prior,
                    model=self.image_model,
                    kernel=self.kernel,
                    cfg=self.config,
                    axis=axis,
                    dims=(Th, Tw, H, W),
                )
            )
            if devices is not None:
                state = jax.device_put(
                    state, self._level_sharding(devices, Th, Tw)
                )
            state, diag = step(k_level, state)
            self.diagnostics.append(jax.device_get(diag))
            d = self.diagnostics[-1]
            if (d["temperature"] < 1.0).any():
                import warnings

                n_stuck = int((d["temperature"] < 1.0).sum())
                warnings.warn(
                    f"aggregation level {level}: {n_stuck} merged tile(s) "
                    f"exited the bridge at the max_smc_iters="
                    f"{self.config.max_smc_iters} cap with temperature < 1 "
                    f"(min {float(d['temperature'].min()):.3f}) — the bridge "
                    "posterior for those tiles is biased toward the "
                    "product-of-children target; raise max_smc_iters or "
                    "relocate_sweeps",
                    stacklevel=2,
                )
            if verbose:
                d = self.diagnostics[-1]
                print(
                    f"level {level}: {int(d['iterations'])} bridge iters, "
                    f"acc rate ~{float(d['acc_rate'].mean()):.2f}"
                )
            if axis == 0:
                Th, H = Th // 2, H * 2
            else:
                Tw, W = Tw // 2, W * 2

        # final resample + prune (aggregate.py:583-589)
        key, k_final = jax.random.split(key)
        N = state.counts.shape[-1]
        idx = resample_indices(
            k_final, state.weights, N, self.config.resample_method
        )
        counts, locs, fluxes = gather_particles(
            idx, state.counts, state.locs, state.fluxes, particle_axis=2
        )
        M = fluxes.shape[-1]
        pruned_counts, pruned_locs, pruned_fluxes = prune_catalog(
            locs,
            fluxes,
            height=H,
            width=W,
            flux_threshold=self.config.flux_detection_threshold,
            mask=slot_mask(counts, M),
        )
        self.state = AggregateState(
            data=state.data,
            counts=counts,
            locs=locs,
            fluxes=fluxes,
            weights=jnp.full(counts.shape, 1.0 / N),
            log_z=state.log_z,
        )
        self.pruned_counts = pruned_counts
        self.pruned_locs = pruned_locs
        self.pruned_fluxes = pruned_fluxes
        self.image_height, self.image_width = H, W
        self.has_run = True
        return self.state

    # -- posterior summaries (aggregate.py:595-639) ---------------------
    @property
    def ess(self):
        return 1.0 / (self.state.weights**2).sum(-1)

    def posterior_mean_count(self, counts=None):
        c = self.pruned_counts if counts is None else counts
        return (self.state.weights * c).sum(-1)

    def posterior_mean_total_flux(self, fluxes=None):
        f = self.state.fluxes if fluxes is None else fluxes
        return (self.state.weights * f.sum(-1)).sum(-1)

    def posterior_predictive_total_observed_flux(self, key):
        """Total observed flux of posterior-predictive draws
        (aggregate.py:605-607, with an explicit PRNG key)."""
        model = self.image_model.replace(
            height=self.image_height, width=self.image_width
        )
        img = model.sample(key, self.state.locs, self.state.fluxes)
        return img.sum((-2, -1))

    def summarize(self):
        if not self.has_run:
            raise ValueError("aggregation procedure hasn't been run yet.")
        import numpy as np

        pc = np.asarray(self.pruned_counts)
        print(
            "posterior distribution of number of detectable stars within "
            "image boundary:"
        )
        vals, cnts = np.unique(pc, return_counts=True)
        print(vals)
        print(np.round(cnts / pc.shape[-1], 3), "\n")
        print(
            "posterior mean total intrinsic flux (including undetectable "
            "and/or in padding) = "
            f"{np.asarray(self.posterior_mean_total_flux())}\n"
        )
        print(
            "posterior mean total intrinsic flux of detectable stars within "
            "image boundary = "
            f"{np.asarray(self.posterior_mean_total_flux(self.pruned_fluxes))}"
        )
