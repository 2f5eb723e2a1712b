"""Count-stratified SMC sampler (CS-SMC), layer L3.

TPU-native re-design of /root/reference/smcdet/sampler.py:9-298.

Key architectural changes vs the reference:

- The ``while any(temperature < 1)`` python loop with host-side
  ``scipy.brentq`` tempering (sampler.py:99-125, :230) becomes a single
  jitted ``lax.while_loop`` with vectorised on-device bisection
  (ops/tempering.py). No host sync anywhere in the sampler.
- Count strata live on a dense leading axis ``[T, C, N, ...]`` with
  per-stratum weights, ESS, and log-normalising constants, fixing the
  reference's API skew where ``Aggregate`` expects per-count normalising
  constants that the current ``SMCsampler`` no longer produces (see
  SURVEY.md §1). With a single stratum (the configuration used by all
  current reference experiments: ``min_objects == max_objects``) this
  reduces exactly to the reference sampler.
- Tiles are a flat leading axis ``[T, ...]``; every operation is
  tile-elementwise, so the whole sampler shards over a
  ``jax.sharding.Mesh`` tile axis with zero communication (one scalar
  ``any()`` reduction per SMC iteration for the loop condition).
- Finished tiles (``temperature == 1``) are frozen: their particles stop
  changing, making per-tile results independent of which other tiles share
  the batch/shard. (The reference keeps mutating finished tiles —
  statistically harmless, but it makes results depend on co-scheduled
  tiles; freezing is required for sharded == unsharded determinism.)
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from smcdet_tpu.inference.kernels import (
    KernelState,
    TargetContext,
    init_kernel_state,
)
from smcdet_tpu.ops.catalogs import prune_catalog, slot_mask
from smcdet_tpu.ops.resampling import gather_particles, resample_indices
from smcdet_tpu.ops.tempering import solve_tempering_step

__all__ = [
    "SMCConfig",
    "SMCState",
    "SMCResult",
    "csmc_init",
    "csmc_step",
    "csmc_finalize",
    "run_csmc",
    "run_csmc_segmented",
    "run_csmc_chunked",
    "max_tiles_per_chunk",
    "pad_tiles",
    "is_per_tile_background",
    "normalize_per_tile_background",
    "SMCSampler",
    "SMCsampler",
]


@struct.dataclass
class SMCConfig:
    num_catalogs: int = struct.field(pytree_node=False)
    ess_threshold_prop: float = struct.field(pytree_node=False, default=0.5)
    resample_method: str = struct.field(
        pytree_node=False, default="multinomial"
    )
    max_smc_iters: int = struct.field(pytree_node=False, default=100)
    flux_detection_threshold: float = 0.0
    # Print temperature/acceptance ranges every k iterations (0 = silent),
    # mirroring sampler.py:233-242 via jax.debug.print.
    print_every: int = struct.field(pytree_node=False, default=0)
    # Record per-iteration temperature/ESS/acceptance trajectories in
    # SMCResult.history (diagnostics the reference only prints).
    record_history: bool = struct.field(pytree_node=False, default=False)
    # Fixed tempering ladder (must end at 1.0) instead of adaptive ESS
    # bisection — the deprecated jsm2024 experiments' scheme
    # (SURVEY.md §2 #19); None = adaptive.
    fixed_schedule: tuple | None = struct.field(
        pytree_node=False, default=None
    )
    # Prior-draw relocation sweeps appended to each mutation
    # (kernels.relocate_sweeps). In the many-object regime the
    # single-component random walk cannot carry a star across the
    # low-probability valley between two source modes; an independence
    # relocation jumps it in one move. 0 disables (the reference has no
    # tile-level analogue; its bridge-level counterpart is
    # aggregate relocate_sweeps).
    relocate_sweeps: int = struct.field(pytree_node=False, default=0)
    # Coordinated two-star pair-redistribute sweeps appended to each
    # mutation (kernels.pair_redistribute_sweeps): virtually merge a
    # nearby pair and re-split it with fresh flux fraction +
    # displacement, conserving total flux and centroid — the cure for
    # the split-mode pathology (one bright star explained as two
    # overlapping ones) that single-component moves cannot escape.
    # 0 disables (the reference has no analogue; its single-site kernel
    # simply mixes slowly there, kernel.py:7-130).
    pair_sweeps: int = struct.field(pytree_node=False, default=0)
    # Bound every device program to at most this many SMC iterations per
    # dispatch, chaining segments from the host (None = the whole
    # temper->resample->mutate loop in ONE lax.while_loop dispatch).
    # Motivation (round 5): this environment kills any single device
    # program at ~200 s with "UNAVAILABLE: TPU device error" — measured
    # with an innocent matmul fori_loop (experiments/
    # probe_long_dispatch.py), which is what felled the cells_pair run
    # at its 100-iteration batch (~190 s under the classic kernel
    # layout). Heavy many-object configs should set this so each
    # dispatch stays well under the limit; segments are bit-exact with
    # the monolithic loop (tests/test_smc.py).
    dispatch_iters: int | None = struct.field(
        pytree_node=False, default=None
    )


class SMCState(NamedTuple):
    key: jax.Array
    locs: jax.Array  # [T, C, N, M, 2]
    fluxes: jax.Array  # [T, C, N, M]
    temperature: jax.Array  # [T]
    temperature_prev: jax.Array  # [T]
    loglik: jax.Array  # [T, C, N]
    weights: jax.Array  # [T, C, N] within-stratum (normalised over N)
    log_z: jax.Array  # [T, C] per-stratum log normalising constant
    ess: jax.Array  # [T, C]
    acc_rate: jax.Array  # [T]
    iteration: jax.Array  # scalar i32
    history: Optional[dict] = None  # {temperature, ess, acc_rate} buffers


class SMCResult(NamedTuple):
    """Final particle system (after the terminal resample) + diagnostics."""

    counts: jax.Array  # [T, C*N] stratum count of each particle
    locs: jax.Array  # [T, C*N, M, 2]
    fluxes: jax.Array  # [T, C*N, M]
    pruned_counts: jax.Array  # [T, C*N] detectable in-bounds sources
    pruned_locs: jax.Array  # [T, C*N, M, 2]
    pruned_fluxes: jax.Array  # [T, C*N, M]
    weights: jax.Array  # [T, C*N] flat posterior weights
    weights_intracount: jax.Array  # [T, C, N]
    log_normalizing_constant: jax.Array  # [T, C]
    temperature: jax.Array  # [T]
    ess: jax.Array  # [T, C]
    num_iters: jax.Array  # scalar
    acc_rate: jax.Array  # [T]
    history: Optional[dict] = None  # [max_iters, ...] trajectories


def _context(prior, model, images, temperature):
    """Per-tile tempered-target context with broadcast-ready shapes."""
    return TargetContext(
        prior=prior,
        model=model,
        image=images[:, None, None],  # [T, 1, 1, H, W]
        temperature=temperature[:, None, None],  # [T, 1, 1]
    )


def _temper_and_reweight(prior, model, images, cfg, state, loglik=None):
    """Adaptive tempering + incremental weight/logZ/ESS update.

    Parity: sampler.py:99-125 (temper) and :181-196 (update_weights), per
    count stratum, with the per-tile step taken as the minimum over strata
    (the rule aggregate.py:140-174 uses). Unlike the reference, which
    re-renders every catalog to recompute the likelihood each iteration
    (sampler.py:100-103), the mutation kernel's incrementally maintained
    likelihood is passed in when available — it is exact up to f32
    accumulation drift (~1e-3 nats over a full run) and saves a full
    ``max_objects``-star re-render per iteration.
    """
    T, C, N = state.loglik.shape
    done = state.temperature >= 1.0

    if loglik is None:
        loglik = model.loglikelihood(
            images[:, None, None], state.locs, state.fluxes
        )  # [T, C, N]

    if cfg.fixed_schedule is not None:
        sched = jnp.asarray(cfg.fixed_schedule, dtype=jnp.float32)
        idx = jnp.minimum(state.iteration, len(cfg.fixed_schedule) - 1)
        target = sched[idx]
        delta = jnp.where(
            done, 0.0, jnp.clip(target - state.temperature, 0.0, 1.0)
        )
    else:
        ess_target = cfg.ess_threshold_prop * N
        delta_c = solve_tempering_step(
            loglik, state.temperature[:, None], ess_target
        )  # [T, C]
        delta = jnp.where(done, 0.0, delta_c.min(-1))  # [T]

    temperature_prev = state.temperature
    temperature = jnp.clip(state.temperature + delta, 0.0, 1.0)

    w_log = jnp.nan_to_num(
        delta[:, None, None] * loglik, nan=-jnp.inf, neginf=-jnp.inf
    )  # [T, C, N]
    m = w_log.max(-1)
    shifted = jnp.exp(w_log - m[..., None])
    s = shifted.sum(-1)
    weights = shifted / s[..., None]
    ess = 1.0 / (weights**2).sum(-1)
    log_z = state.log_z + jnp.where(done[:, None], 0.0, m + jnp.log(s / N))

    # Frozen tiles keep their previous weights/ess (their delta is 0, which
    # would otherwise reset weights to uniform — the reference's behaviour —
    # but freezing keeps the last informative weights for the final sample).
    keep = done[:, None, None]
    weights = jnp.where(keep, state.weights, weights)
    ess = jnp.where(done[:, None], state.ess, ess)

    return state._replace(
        temperature=temperature,
        temperature_prev=temperature_prev,
        loglik=jnp.where(keep, state.loglik, loglik),
        weights=weights,
        log_z=log_z,
        ess=ess,
    )


@partial(
    jax.jit,
    static_argnames=("num_tiles_h", "num_tiles_w", "tile_dim"),
)
def tile_image(image, num_tiles_h: int, num_tiles_w: int, tile_dim: int):
    """Non-overlapping tiling: ``[imH, imW] -> [Th*Tw, tile, tile]``
    (the reference's double ``unfold``, sampler.py:29-31 — which, like
    this, silently drops any remainder rows/columns)."""
    image = image[: num_tiles_h * tile_dim, : num_tiles_w * tile_dim]
    tiles = image.reshape(num_tiles_h, tile_dim, num_tiles_w, tile_dim)
    return tiles.transpose(0, 2, 1, 3).reshape(-1, tile_dim, tile_dim)


def _strata(prior):
    return jnp.arange(
        prior.min_objects, prior.max_objects + 1, dtype=jnp.int32
    )


def csmc_init(key, images, prior, model, cfg: SMCConfig) -> SMCState:
    """Initialize the CS-SMC particle system for ``images [T, h, w]`` and
    take the iteration-0 temper step (sampler.py:57-85, :226-228).

    ``run_csmc`` = ``csmc_init`` → ``csmc_step`` until every tile reaches
    temperature 1 → ``csmc_finalize``; the pieces are exposed so a host
    scheduler can drive the loop step-at-a-time (inference/streaming.py).
    """
    T = images.shape[0]
    N = cfg.num_catalogs
    C = prior.num_counts

    key, k_init = jax.random.split(key)
    strata, locs, fluxes = prior.sample_stratified(k_init, N, batch_shape=(T,))
    counts_b = jnp.broadcast_to(strata[None, :, None], (T, C, N))

    state = SMCState(
        key=key,
        locs=locs,
        fluxes=fluxes,
        temperature=jnp.zeros(T),
        temperature_prev=jnp.zeros(T),
        loglik=jnp.zeros((T, C, N)),
        weights=jnp.full((T, C, N), 1.0 / N),
        # CS-SMC stratum seeds: log p(count = c) renormalised over the
        # stratum support, so softmax(log_z) is the posterior count pmf.
        log_z=jnp.broadcast_to(
            prior.count_log_prob_truncated(strata)[None, :], (T, C)
        ),
        ess=jnp.full((T, C), float(N)),
        acc_rate=jnp.zeros(T),
        iteration=jnp.asarray(0, dtype=jnp.int32),
        history=(
            {
                "temperature": jnp.zeros((cfg.max_smc_iters, T)),
                "ess": jnp.zeros((cfg.max_smc_iters, T, C)),
                "acc_rate": jnp.zeros((cfg.max_smc_iters, T)),
            }
            if cfg.record_history
            else None
        ),
    )
    # seed the mutation-kernel caches once; thereafter they ride along
    # through resampling (a full re-render costs an M-star render per
    # catalog per iteration — the single biggest per-iteration expense)
    ctx0 = _context(prior, model, images, state.temperature)
    kstate0 = init_kernel_state(ctx0, counts_b, locs, fluxes)
    return _temper_and_reweight(
        prior, model, images, cfg, state, loglik=kstate0.parent_ll
    )


def csmc_step(images, prior, model, kernel, cfg: SMCConfig, state) -> SMCState:
    """One temper→resample→mutate→reweight iteration (sampler.py:230-247).

    Pure function of the carried ``SMCState``; tiles already at
    temperature 1 are frozen (their particles/weights pass through
    unchanged), so a host scheduler may keep stepping a batch containing
    finished tiles without perturbing their posterior.
    """
    T, C, N = state.loglik.shape
    counts_b = jnp.broadcast_to(_strata(prior)[None, :, None], (T, C, N))

    key, k_res, k_mut = jax.random.split(state.key, 3)
    done = state.temperature >= 1.0
    keep = done[:, None, None]

    # resample within each stratum (sampler.py:127-169)
    idx = resample_indices(
        k_res, state.weights, N, cfg.resample_method
    )  # [T, C, N]
    ctx = _context(prior, model, images, state.temperature)
    # Re-render the mutation caches from the resampled particles each
    # iteration, like the reference (sampler.py:100-103). Carrying the
    # incrementally-updated caches through resampling instead was
    # measured to lose badly: f32 accumulation drift in the rate
    # images loosens the adaptive tempering steps (23 iterations
    # re-rendering vs 72 carrying over 8 iterations on the M71
    # bench), while the render itself is a small fraction of a
    # sweep-dominated iteration.
    locs, fluxes = gather_particles(
        idx, state.locs, state.fluxes, particle_axis=2
    )
    locs = jnp.where(keep[..., None, None], state.locs, locs)
    fluxes = jnp.where(keep[..., None], state.fluxes, fluxes)
    ks = init_kernel_state(ctx, counts_b, locs, fluxes)
    rate, loglik, logprior = ks.rate, ks.parent_ll, ks.logprior
    weights = jnp.where(keep, state.weights, 1.0 / N)

    # mutate (sampler.py:171-179 → kernel.run_from_state)
    kstate_in = KernelState(
        locs=locs,
        fluxes=fluxes,
        rate=rate,
        child_rate=None,
        parent_ll=loglik,
        child_ll=None,
        logprior=logprior,
    )
    kstate, acc_rate = kernel.run_from_state(
        k_mut, ctx, counts_b, kstate_in
    )
    n_extra = 0
    if cfg.relocate_sweeps:
        from smcdet_tpu.inference.kernels import relocate_sweeps

        key, k_rel = jax.random.split(key)
        kstate, acc_rel = relocate_sweeps(
            k_rel, ctx, counts_b, kstate, cfg.relocate_sweeps
        )
        n_mh = kernel.num_iters
        acc_rate = (
            acc_rate * n_mh + acc_rel * cfg.relocate_sweeps
        ) / (n_mh + cfg.relocate_sweeps)
        n_extra += cfg.relocate_sweeps
    if cfg.pair_sweeps:
        from smcdet_tpu.inference.kernels import pair_redistribute_sweeps

        key, k_pair = jax.random.split(key)
        kstate, acc_pair = pair_redistribute_sweeps(
            k_pair, ctx, counts_b, kstate, cfg.pair_sweeps
        )
        n_prev = kernel.num_iters + n_extra
        acc_rate = (
            acc_rate * n_prev + acc_pair * cfg.pair_sweeps
        ) / (n_prev + cfg.pair_sweeps)
    locs = jnp.where(keep[..., None, None], state.locs, kstate.locs)
    fluxes = jnp.where(keep[..., None], state.fluxes, kstate.fluxes)
    loglik = jnp.where(keep, state.loglik, kstate.parent_ll)
    acc_tile = acc_rate.mean(-1)  # [T]

    state = state._replace(
        key=key,
        locs=locs,
        fluxes=fluxes,
        weights=weights,
        acc_rate=jnp.where(done, state.acc_rate, acc_tile),
        iteration=state.iteration + 1,
    )
    state = _temper_and_reweight(
        prior, model, images, cfg, state, loglik=loglik
    )

    if cfg.record_history:
        i = state.iteration - 1
        state = state._replace(
            history={
                "temperature": state.history["temperature"]
                .at[i]
                .set(state.temperature),
                "ess": state.history["ess"].at[i].set(state.ess),
                "acc_rate": state.history["acc_rate"]
                .at[i]
                .set(state.acc_rate),
            }
        )

    if cfg.print_every:
        jax.lax.cond(
            state.iteration % cfg.print_every == 0,
            lambda: jax.debug.print(
                "iteration {i}: temperature in [{tlo:.2f}, {thi:.2f}], "
                "acceptance rate in [{alo:.2f}, {ahi:.2f}]",
                i=state.iteration,
                tlo=state.temperature.min(),
                thi=state.temperature.max(),
                alo=state.acc_rate.min(),
                ahi=state.acc_rate.max(),
            ),
            lambda: None,
        )
    return state


def csmc_finalize(prior, model, cfg: SMCConfig, state) -> SMCResult:
    """Final resample + prune (sampler.py:249-252) of a stepped state."""
    T, C, N = state.loglik.shape
    strata = _strata(prior)

    key, k_final = jax.random.split(state.key)
    idx = resample_indices(k_final, state.weights, N, cfg.resample_method)
    locs, fluxes = gather_particles(
        idx, state.locs, state.fluxes, particle_axis=2
    )

    M = locs.shape[-2]
    flat_counts = jnp.broadcast_to(strata[None, :, None], (T, C, N)).reshape(
        T, C * N
    )
    flat_locs = locs.reshape(T, C * N, M, 2)
    flat_fluxes = fluxes.reshape(T, C * N, M)

    pruned_counts, pruned_locs, pruned_fluxes = prune_catalog(
        flat_locs,
        flat_fluxes,
        height=model.height,
        width=model.width,
        flux_threshold=cfg.flux_detection_threshold,
        mask=slot_mask(flat_counts, M),
    )

    # Flat posterior weights: P(count stratum) x within-stratum weight
    # (uniform after the final resample).
    count_pmf = jax.nn.softmax(state.log_z, axis=-1)  # [T, C]
    flat_weights = jnp.broadcast_to(
        count_pmf[..., None] / N, (T, C, N)
    ).reshape(T, C * N)

    return SMCResult(
        counts=flat_counts,
        locs=flat_locs,
        fluxes=flat_fluxes,
        pruned_counts=pruned_counts,
        pruned_locs=pruned_locs,
        pruned_fluxes=pruned_fluxes,
        weights=flat_weights,
        weights_intracount=jnp.full((T, C, N), 1.0 / N),
        log_normalizing_constant=state.log_z,
        temperature=state.temperature,
        ess=state.ess,
        num_iters=state.iteration,
        acc_rate=state.acc_rate,
        history=state.history,
    )


def run_csmc(key, images, prior, model, kernel, cfg: SMCConfig) -> SMCResult:
    """Run count-stratified SMC on a batch of tiles ``images [T, h, w]``.

    The full temper→resample→mutate→reweight loop runs on device inside one
    ``lax.while_loop`` (call under ``jit``; see ``SMCSampler`` for the
    user-facing wrapper). Call stack parity: sampler.py:221-256. For a
    host-scheduled tile pool over the same pieces see
    ``inference/streaming.py``.
    """
    state = csmc_init(key, images, prior, model, cfg)

    def cond(state):
        return jnp.any(state.temperature < 1.0) & (
            state.iteration < cfg.max_smc_iters
        )

    state = jax.lax.while_loop(
        cond,
        lambda s: csmc_step(images, prior, model, kernel, cfg, s),
        state,
    )
    return csmc_finalize(prior, model, cfg, state)


def _csmc_segment(images, prior, model, kernel, cfg: SMCConfig, state,
                  iter_cap):
    """One bounded stretch of the CS-SMC loop: step until converged or
    ``state.iteration == iter_cap`` (dynamic), in one device program."""

    def cond(s):
        return jnp.any(s.temperature < 1.0) & (s.iteration < iter_cap)

    return jax.lax.while_loop(
        cond,
        lambda s: csmc_step(images, prior, model, kernel, cfg, s),
        state,
    )


# donate the incoming state (arg 5): the caller always rebinds it to the
# segment's result, and without donation the boundary briefly holds two
# full particle states (the dominant live allocation) on device
_SEGMENT_JIT = jax.jit(_csmc_segment, donate_argnums=5)
_INIT_JIT = jax.jit(csmc_init)
_FINALIZE_JIT = jax.jit(csmc_finalize)


def run_csmc_segmented(key, images, prior, model, kernel,
                       cfg: SMCConfig, *, _segment=None) -> SMCResult:
    """``run_csmc`` with every device program bounded to
    ``cfg.dispatch_iters`` SMC iterations, chained from the host.

    Same signature and bit-identical results (the segment body is the
    same ``csmc_step``; the state — particles, caches, PRNG key,
    iteration — round-trips losslessly between dispatches). Exists
    because this environment kills any single device program at ~200 s
    ("UNAVAILABLE: TPU device error", measured with an innocent matmul
    loop — experiments/probe_long_dispatch.py); heavy configs whose
    monolithic while_loop would exceed that must be dispatched in
    segments. Costs one small host fetch (the temperature array) per
    segment.
    """
    seg = cfg.dispatch_iters or cfg.max_smc_iters
    seg_fn = _segment if _segment is not None else _SEGMENT_JIT
    state = _INIT_JIT(key, images, prior, model, cfg)
    done = 0
    while done < cfg.max_smc_iters:
        cap = min(done + seg, cfg.max_smc_iters)
        state = jax.block_until_ready(
            seg_fn(
                images, prior, model, kernel, cfg, state, jnp.int32(cap)
            )
        )
        done = cap
        if not bool(jnp.any(state.temperature < 1.0)):
            break
    return _FINALIZE_JIT(prior, model, cfg, state)


def max_tiles_per_chunk(
    prior, num_catalogs: int, tile_hw: int, budget_bytes: int = 12 * 2**30
) -> int:
    """Largest tile batch fitting the per-device memory budget.

    The dominant live arrays are the per-particle rate caches (~5 float
    copies of ``[T, C, N, H*W]`` between the SMC carry, the mutation
    kernel, resampling temporaries, and kernel staging); 256 tiles x 7
    strata x 2048 catalogs faults a 16 GiB chip, and 50 tiles x 13
    strata x 4096 catalogs at 16x16 px faulted under a 4-copy model that
    predicted it would just fit — hence 5.
    """
    C = prior.num_counts
    per_tile = C * num_catalogs * (5 * tile_hw + 8 * prior.max_objects + 32) * 4
    return max(1, budget_bytes // max(per_tile, 1))


def pad_tiles(leaf, n: int):
    """Pad (or trim) axis 0 to ``n`` by repeating the last tile, so every
    batch shares one compiled shape; padded results are discarded by the
    caller."""
    if n <= leaf.shape[0]:
        return leaf[:n]
    reps = jnp.broadcast_to(leaf[-1:], (n - leaf.shape[0],) + leaf.shape[1:])
    return jnp.concatenate([leaf, reps])


def is_per_tile_background(background, num_tiles: int) -> bool:
    """True when ``background`` is a per-tile map ``[T, ..., H, W]``
    that must be sliced/permuted in lockstep with the tile axis.

    Callers must pass a detected map through
    ``normalize_per_tile_background`` before handing it to the model:
    ``TargetContext.init_rates`` flattens the trailing ``[H, W]`` dims,
    so a natural ``[T, h, w]`` map would become ``[T, HW]`` and
    broadcast ``T`` against the particle axis — a silent wrong-rate
    computation when the shapes happen to line up."""
    bg = jnp.asarray(background)
    return bg.ndim >= 3 and bg.shape[0] == num_tiles


def normalize_per_tile_background(background):
    """Promote a per-tile background map to the broadcast-ready rank
    ``[T, 1, 1, h, w]`` expected against the ``[T, C, N, HW]`` particle
    batch (after ``init_rates`` flattens the trailing image dims).
    ``[T, h, w]`` and ``[T, 1, h, w]`` inputs are promoted; rank >= 5 is
    assumed already broadcast-ready and passed through."""
    bg = jnp.asarray(background)
    if bg.ndim == 3:
        return bg[:, None, None]
    if bg.ndim == 4:
        return bg[:, None]
    return bg


def compiled_live_bytes(compiled) -> int | None:
    """Peak device-memory commitment of a compiled executable: arguments +
    outputs + XLA temporaries, from ``compiled.memory_analysis()``.

    Returns ``None`` when the backend reports no temp data (CPU reports
    ``temp_size_in_bytes == 0`` unconditionally), so callers can
    distinguish "measured small" from "not measured".
    """
    try:
        ma = compiled.memory_analysis()
        temp = int(ma.temp_size_in_bytes)
        if temp == 0:
            return None
        return (
            temp
            + int(ma.argument_size_in_bytes)
            + int(ma.output_size_in_bytes)
        )
    except Exception:  # backend without memory stats
        return None


def _abstract_sig(tree):
    """Hashable (treedef, leaf-aval) signature of a pytree: shapes,
    dtypes, and static structure, but not array values. Non-array leaves
    key on their ``repr`` (conservative: a changed Python-scalar leaf is
    a cache miss, never a wrong hit)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    sig = []
    for leaf in leaves:
        dtype = getattr(leaf, "dtype", None)
        if dtype is not None:
            sig.append((getattr(leaf, "shape", None), str(dtype)))
        else:
            sig.append((None, repr(leaf)))
    return treedef, tuple(sig)


# AOT-compile memo for run_csmc_chunked: ``jit.lower().compile()``
# bypasses jit's in-memory executable cache, so without this every
# chunked call (one per experiment batch) re-traces and re-compiles the
# full SMC program — multi-minute over a TPU tunnel. Values keep a
# reference to the ``run`` jit object so its ``id`` stays valid.
_CHUNK_AOT_CACHE: dict = {}


def run_csmc_chunked(
    key,
    images,
    prior,
    model,
    kernel,
    cfg: SMCConfig,
    run=None,
    budget_bytes: int = 12 * 2**30,
    multiple: int = 1,
    sort_tiles: bool = False,
) -> SMCResult:
    """``run_csmc`` over a tile batch too large for device memory:
    sequential equal-size chunks (compile reused), concatenated along the
    tile axis. Per-tile CS-SMC is independent, so this is exact.

    ``multiple``: tile-count divisor every chunk must satisfy — the mesh
    size when ``run`` is a tile-sharded runner (the budget is per device,
    so the chunk capacity also scales by it); ragged tile counts are
    padded up and sliced back.

    ``sort_tiles``: process tiles in order of total image flux. Inside a
    jitted chunk every tile runs to the *chunk-max* SMC iteration count
    (the ``lax.while_loop`` predicate is a batch ``any``), so a chunk
    mixing one crowded tile with quiet ones bills every quiet tile at the
    crowded tile's adaptive-tempering length. Grouping
    similar-brightness tiles makes chunks iteration-homogeneous: on the
    332-cutout M71 frame at N=4096 this cut frame wall 74s -> 43s (4.49
    -> 7.69 tiles/s) with updates/s unchanged. Results are returned in
    the caller's original tile order; only the key->tile assignment
    changes (each tile's posterior is exact either way).

    The chunk size starts from the analytic ``max_tiles_per_chunk``
    estimate; when ``run`` is an inspectable jit (has ``.lower``), the
    chunk program is AOT-compiled and its *measured* live bytes
    (``compiled_live_bytes``) are checked against the budget, halving the
    chunk until it fits — the measured feedback loop replacing the purely
    hand-tuned 5-copy constant. The compiled executable is then used
    directly, so the check costs no extra compilation.
    """
    T = images.shape[0]
    order = None
    if sort_tiles and T > 1:
        order = jnp.argsort(jnp.sum(images, axis=tuple(range(1, images.ndim))))
        images = images[order]
    chunk = multiple * max_tiles_per_chunk(
        prior, cfg.num_catalogs, images.shape[1] * images.shape[2], budget_bytes
    )
    if run is None:
        run = jax.jit(run_csmc)
    if cfg.dispatch_iters is not None:
        if multiple > 1:
            # Mesh runners keep their single-dispatch program —
            # segmentation there would need a sharded segment jit;
            # unsupported for now. Be loud: the user set the knob
            # specifically to dodge the ~200 s dispatch kill limit.
            warnings.warn(
                "SMCConfig.dispatch_iters is not supported with a mesh "
                "runner (multiple > 1) and is being IGNORED — chunks run "
                "as single device programs subject to the ~200 s "
                "dispatch kill limit (docs/PERF.md).",
                stacklevel=2,
            )
        else:
            # bounded-dispatch mode supersedes the caller's runner: each
            # chunk is driven through host-chained segments (see
            # run_csmc_segmented) instead of one monolithic device
            # program. Chunk sizing below AOT-probes the SEGMENT
            # program itself (same state, same step body).
            run = run_csmc_segmented

    def unsort(res: SMCResult) -> SMCResult:
        # restore the caller's tile order after a sort_tiles permutation
        if order is None:
            return res
        inv = jnp.argsort(order)
        out = {}
        for f in res._fields:
            v = getattr(res, f)
            if f == "history":
                out[f] = (
                    None if v is None else {k: h[:, inv] for k, h in v.items()}
                )
            elif f == "num_iters":
                out[f] = v
            else:
                out[f] = v[inv]
        return SMCResult(**out)

    # a per-tile background map ([T, ...] leading axis) must be chunked
    # in lockstep with the tile axis of ``images``
    bg = jnp.asarray(model.background)
    per_tile_bg = is_per_tile_background(bg, T)
    if per_tile_bg:
        bg = normalize_per_tile_background(bg)
        if order is not None:
            bg = bg[order]

    def model_for(bg_slice):
        return model.replace(background=bg_slice) if per_tile_bg else model

    if (
        T <= chunk
        and T % multiple == 0
        and not hasattr(run, "lower")
        and run is not run_csmc_segmented
    ):
        # not inspectable: trust the analytic estimate and run whole.
        # fold_in(key, 0) matches the chunk loop's key for chunk 0 so
        # results are key-identical whichever path a runner takes.
        # (The segmented runner IS sizable — its segment jit is probed
        # below — so it does not take this early exit.)
        return unsort(
            run(
                jax.random.fold_in(key, 0),
                images, prior, model_for(bg), kernel, cfg,
            )
        )

    n_chunks = max(1, -(-T // chunk))
    size = -(-T // n_chunks)
    size = -(-size // multiple) * multiple

    # measured-memory feedback: compile once at the chosen size, verify
    # against the budget, shrink if XLA's actual temp allocation exceeds
    # it. This also covers the fits-in-one-chunk case — the scenario the
    # analytic model got wrong historically. The probe is padded to
    # ``size`` so the lowered shape matches the padded chunks fed later.
    exec_run = run
    segmented = run is run_csmc_segmented
    if hasattr(run, "lower") or segmented:
        cache_key = (
            id(run),
            size,
            budget_bytes,
            _abstract_sig(
                (
                    images[:1],
                    bg[:1] if per_tile_bg else None,
                    prior,
                    model,
                    kernel,
                    cfg,
                )
            ),
        )
        hit = _CHUNK_AOT_CACHE.get(cache_key)
        if hit is not None:
            exec_run, size = hit[0], hit[1]
        else:

            def lower_at(size):
                imgs = pad_tiles(images, size)
                mdl = model_for(pad_tiles(bg, size) if per_tile_bg else None)
                if segmented:
                    # probe the SEGMENT program — the exact executable
                    # the host-chained loop dispatches — via abstract
                    # state from eval_shape (no device init needed)
                    state = jax.eval_shape(
                        csmc_init, key, imgs, prior, mdl, cfg
                    )
                    return _SEGMENT_JIT.lower(
                        imgs, prior, mdl, kernel, cfg, state,
                        jax.ShapeDtypeStruct((), jnp.int32),
                    )
                return run.lower(key, imgs, prior, mdl, kernel, cfg)

            while True:
                compiled = lower_at(size).compile()
                live = compiled_live_bytes(compiled)
                if live is None or live <= budget_bytes or size <= multiple:
                    break
                half = max(1, (size // multiple) // 2) * multiple
                if half == size:
                    break
                size = half
            if segmented:
                # reuse the probed executable for the real dispatches so
                # the probe costs no extra compilation
                exec_run = partial(run_csmc_segmented, _segment=compiled)
            else:
                exec_run = compiled
            _CHUNK_AOT_CACHE[cache_key] = (exec_run, size, run)

    n_chunks = -(-T // size)
    # pad the tile axis so every chunk has the same shape: a smaller last
    # chunk would trigger a second XLA compile (minutes over a TPU
    # tunnel), far costlier than computing a few duplicate tiles
    T_pad = n_chunks * size
    images = pad_tiles(images, T_pad)
    if per_tile_bg:
        bg = pad_tiles(bg, T_pad)
    parts = []
    for i in range(0, T_pad, size):
        part = exec_run(
            jax.random.fold_in(key, i),
            images[i : i + size],
            prior,
            model_for(bg[i : i + size] if per_tile_bg else None),
            kernel,
            cfg,
        )
        parts.append(jax.block_until_ready(part))
    stacked = {}
    for f in parts[0]._fields:
        vals = [getattr(p, f) for p in parts]
        if f == "history":
            stacked[f] = (
                None
                if vals[0] is None
                else {
                    k: jnp.concatenate([v[k] for v in vals], axis=1)[:, :T]
                    for k in vals[0]
                }
            )
        elif f == "num_iters":
            stacked[f] = jnp.stack(vals).max()
        else:
            stacked[f] = jnp.concatenate(vals, axis=0)[:T]
    return unsort(SMCResult(**stacked))


class SMCSampler:
    """User-facing wrapper mirroring the reference ``SMCsampler`` API
    (sampler.py:9-298): tile the image, run CS-SMC, expose posterior
    summaries. All heavy lifting happens in the jitted ``run_csmc``."""

    def __init__(
        self,
        image,
        tile_dim,
        Prior,
        ImageModel,
        MutationKernel,
        num_catalogs,
        ess_threshold_prop=0.5,
        resample_method="multinomial",
        flux_detection_threshold=0.0,
        max_smc_iters=100,
        print_every=0,
        relocate_sweeps=0,
        pair_sweeps=0,
        dispatch_iters=None,
    ):
        self.image = jnp.asarray(image, dtype=jnp.float32)
        self.image_height, self.image_width = self.image.shape
        self.tile_dim = tile_dim
        self.num_tiles_h = self.image_height // tile_dim
        self.num_tiles_w = self.image_width // tile_dim
        self.tiled_image = tile_image(
            self.image, self.num_tiles_h, self.num_tiles_w, tile_dim
        )
        self.prior = Prior
        self.image_model = ImageModel
        self.kernel = MutationKernel
        self.config = SMCConfig(
            num_catalogs=num_catalogs,
            ess_threshold_prop=ess_threshold_prop,
            resample_method=resample_method,
            max_smc_iters=max_smc_iters,
            flux_detection_threshold=flux_detection_threshold,
            print_every=print_every,
            relocate_sweeps=relocate_sweeps,
            pair_sweeps=pair_sweeps,
            dispatch_iters=dispatch_iters,
        )
        self.result: SMCResult | None = None

    def _max_tiles_per_chunk(self) -> int:
        """See ``max_tiles_per_chunk``; override the budget with
        ``SMCSampler.memory_budget_bytes``."""
        return max_tiles_per_chunk(
            self.prior,
            self.config.num_catalogs,
            self.tile_dim * self.tile_dim,
            getattr(self, "memory_budget_bytes", 12 * 2**30),
        )

    def run(self, key=None, devices=None, streaming=False) -> SMCResult:
        """Run the sampler. ``devices``: optional list for a tile-sharded
        mesh (see parallel/sharding.py); default single-device jit. Tile
        batches exceeding the device memory budget are processed in
        sequential chunks (per-tile CS-SMC is independent), or — with
        ``streaming=True`` — through the swap-on-converge tile pool
        (inference/streaming.py), which removes the chunk-max iteration
        waste on heterogeneous frames."""
        if key is None:
            key = jax.random.key(0)
        if streaming:
            from smcdet_tpu.inference.streaming import run_csmc_streaming

            self.result = run_csmc_streaming(
                key,
                self.tiled_image,
                self.prior,
                self.image_model,
                self.kernel,
                self.config,
                budget_bytes=getattr(self, "memory_budget_bytes", 12 * 2**30),
                devices=devices,
            )
            return self.result
        run = jax.jit(run_csmc, static_argnames=())
        if devices is not None:
            from smcdet_tpu.parallel.sharding import shard_tiles_jit

            run = shard_tiles_jit(run_csmc, devices)

        self.result = run_csmc_chunked(
            key,
            self.tiled_image,
            self.prior,
            self.image_model,
            self.kernel,
            self.config,
            run=run,
            budget_bytes=getattr(self, "memory_budget_bytes", 12 * 2**30),
            multiple=len(devices) if devices is not None else 1,
        )
        return self.result

    # -- posterior summaries (sampler.py:258-298) -----------------------
    @property
    def has_run(self):
        return self.result is not None

    def posterior_mean_count(self, counts=None):
        r = self.result
        c = r.pruned_counts if counts is None else counts
        return (r.weights * c).sum(-1)

    def posterior_mean_total_flux(self, fluxes=None):
        r = self.result
        f = r.fluxes if fluxes is None else fluxes
        return (r.weights * f.sum(-1)).sum(-1)

    def posterior_predictive_total_observed_flux(self, key):
        r = self.result
        img = self.image_model.sample(key, r.locs, r.fluxes)
        return img.sum((-2, -1))

    def summarize(self):
        if not self.has_run:
            raise ValueError("Sampler hasn't been run yet.")
        import numpy as np

        r = self.result
        pc = np.asarray(r.pruned_counts)
        print(
            "posterior distribution of number of detectable stars within "
            "image boundary:"
        )
        vals, cnts = np.unique(pc, return_counts=True)
        print(vals)
        print(np.round(cnts / pc.shape[-1], 3), "\n")
        print(
            "posterior mean total intrinsic flux (including undetectable "
            f"and/or in padding) = {np.asarray(self.posterior_mean_total_flux())}\n"
        )
        print(
            "posterior mean total intrinsic flux of detectable stars within "
            "image boundary = "
            f"{np.asarray(self.posterior_mean_total_flux(r.pruned_fluxes))}\n"
        )
        print(
            "number of unique catalogs =",
            np.unique(np.asarray(r.fluxes[0].sum(-1))).shape[0],
        )


# Reference spelling.
SMCsampler = SMCSampler
