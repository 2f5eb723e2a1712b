"""Streaming (continuation-batched) CS-SMC over a persistent tile pool.

Motivation. ``run_csmc_chunked`` jits a chunk of tiles into one
``lax.while_loop`` whose predicate is a batch ``any()`` — every tile in
the chunk is billed at the *chunk-max* adaptive-tempering length, so a
chunk mixing one crowded tile with quiet ones wastes the quiet tiles'
slots for the crowded tile's extra iterations. Difficulty-ordered
chunking (``sort_tiles=True``) recovers most of that (docs/PERF.md chunk
sweep: 4.49 → 8.00 tiles/s on the M71 frame), but the max-vs-mean gap
within a chunk remains.

This module removes the gap structurally: a fixed-size pool of tile
slots steps together under one compiled ``csmc_step`` program, and the
host finalizes every tile the moment its done flag is observed, swapping
a fresh tile into the freed slot. All shapes are static — slot access is
a ``dynamic_slice``/``dynamic_update_slice`` on each state leaf with a
*traced* slot index — so the whole run uses four compiled programs
(init, step, slot finalize, slot insert), all module-level jits shared
across calls. Scheduling runs on the host off the device's critical
path: the done-flag read of step *k* overlaps with the device executing
the already-dispatched step *k+1*, hiding the tunnel round-trip at the
cost of one speculative (frozen) step per finished tile.

The reference has no analogue (its sampler runs one image per process,
run_smc.py:105-181); this is the TPU-native replacement for "start the
next process when one finishes".

Semantics. Per-tile posteriors are exact and schedule-independent in
distribution: tiles at temperature 1 are frozen by ``csmc_step``
(inference/smc.py), and every tile is finalized from the first state in
which it was observed done — so speculative steps never leak into
results, including tiles that hit the ``max_smc_iters`` cap with
temperature < 1 (they are finalized at exactly the cap, like
``run_csmc``'s loop bound, even though their slot keeps computing until
it is reused). The PRNG stream is shared across the pool, so the
*sample* depends on the pool schedule (immaterial; every schedule yields
an exact posterior sample); re-running with the same inputs and pool
size is deterministic. With ``pool >= T`` the executed iteration
sequence is identical to ``run_csmc``'s ``lax.while_loop``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from smcdet_tpu.inference.smc import (
    SMCConfig,
    SMCResult,
    SMCState,
    compiled_live_bytes,
    csmc_finalize,
    csmc_init,
    csmc_step,
    is_per_tile_background,
    max_tiles_per_chunk,
    normalize_per_tile_background,
    pad_tiles,
)

__all__ = ["run_csmc_streaming"]

# pool shapes whose step program already passed the measured-memory check
# this process (the AOT probe costs one duplicate compile per shape)
# requested-pool signature -> budget-verified pool size (identity when
# no halving was needed); see _measured_pool_check
_checked_pool_shapes: dict = {}


def _slot_substate(state: SMCState, slot) -> SMCState:
    """Extract one slot's ``[1, ...]`` sub-state (``slot`` may be traced).

    The sub-state's key is forked from the shared pool key by slot so a
    finalize on it never replays draws the pool stream will make next.
    """

    def take(leaf):
        return jax.lax.dynamic_slice_in_dim(leaf, slot, 1, axis=0)

    return SMCState(
        key=jax.random.fold_in(state.key, 10_000 + slot),
        locs=take(state.locs),
        fluxes=take(state.fluxes),
        temperature=take(state.temperature),
        temperature_prev=take(state.temperature_prev),
        loglik=take(state.loglik),
        weights=take(state.weights),
        log_z=take(state.log_z),
        ess=take(state.ess),
        acc_rate=take(state.acc_rate),
        iteration=state.iteration,
        history=None,
    )


def _insert_substate(state: SMCState, sub: SMCState, slot) -> SMCState:
    """Scatter a ``[1, ...]`` sub-state into pool slot ``slot``.

    The pool's shared key is left untouched (the inserted tile draws from
    the shared stream from its next step on)."""

    def put(leaf, new):
        return jax.lax.dynamic_update_slice_in_dim(leaf, new, slot, axis=0)

    return state._replace(
        locs=put(state.locs, sub.locs),
        fluxes=put(state.fluxes, sub.fluxes),
        temperature=put(state.temperature, sub.temperature),
        temperature_prev=put(state.temperature_prev, sub.temperature_prev),
        loglik=put(state.loglik, sub.loglik),
        weights=put(state.weights, sub.weights),
        log_z=put(state.log_z, sub.log_z),
        ess=put(state.ess, sub.ess),
        acc_rate=put(state.acc_rate, sub.acc_rate),
    )


def _model_for(model, bg_slice, per_tile_bg: bool):
    return model.replace(background=bg_slice) if per_tile_bg else model


# Module-level jits: shared (and warm) across run_csmc_streaming calls —
# prior/model/cfg ride through as pytree arguments, so the cache keys on
# their structure and shapes, not on per-call closure identity.
_init_jit = jax.jit(csmc_init)
_step_jit = jax.jit(csmc_step)


@partial(jax.jit, static_argnames=("per_tile_bg",))
def _finalize_slot(state, pool_bg, slot, prior, model, cfg, per_tile_bg):
    """Finalize one slot from the state it was observed done in."""
    bg1 = (
        jax.lax.dynamic_slice_in_dim(pool_bg, slot, 1, axis=0)
        if per_tile_bg
        else None
    )
    return csmc_finalize(
        prior,
        _model_for(model, bg1, per_tile_bg),
        cfg,
        _slot_substate(state, slot),
    )


@partial(jax.jit, static_argnames=("per_tile_bg",))
def _insert_slot(
    state, pool_images, pool_bg, slot, k_init, image, bg1,
    prior, model, cfg, per_tile_bg,
):
    """Initialize a fresh tile and scatter it into pool slot ``slot``."""
    sub = csmc_init(
        k_init,
        image[None],
        prior,
        _model_for(model, bg1[None] if per_tile_bg else None, per_tile_bg),
        cfg,
    )
    state = _insert_substate(state, sub, slot)
    pool_images = jax.lax.dynamic_update_slice_in_dim(
        pool_images, image[None], slot, axis=0
    )
    if per_tile_bg:
        pool_bg = jax.lax.dynamic_update_slice_in_dim(
            pool_bg, bg1[None], slot, axis=0
        )
    return state, pool_images, pool_bg


def _measured_pool_check(
    P, images, bg, per_tile_bg, prior, model, kernel, cfg, budget_bytes
):
    """Verify the analytic pool size against XLA's actual allocation.

    Mirrors ``run_csmc_chunked``'s measured-memory feedback: AOT-compile
    the step program at the pool shape, read ``compiled_live_bytes``, and
    halve the pool until it fits the budget. The probe costs one
    duplicate compile per new shape (cached per process; backends
    without memory stats — CPU — skip immediately). Single-device only:
    abstract lowering carries no sharding information.
    """
    H, W = images.shape[1], images.shape[2]

    def probe(p):
        imgs = jax.ShapeDtypeStruct((p, H, W), images.dtype)
        if per_tile_bg:
            bg_s = jax.ShapeDtypeStruct((p,) + bg.shape[1:], bg.dtype)
            m = model.replace(background=bg_s)
        else:
            m = model
        key_s = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
        state_s = jax.eval_shape(csmc_init, key_s, imgs, prior, m, cfg)
        compiled = _step_jit.lower(imgs, prior, m, kernel, cfg, state_s).compile()
        return compiled_live_bytes(compiled)

    if jax.default_backend() == "cpu":
        return P  # CPU reports no temp stats; the probe would be wasted
    # key on the REQUESTED pool size and map to the verified one: when
    # halving occurred, a repeat request at the original P must hit the
    # cache too, not re-run the probe/halving compiles every call
    sig = (P, H, W, cfg.num_catalogs, prior.num_counts, per_tile_bg)
    cached = _checked_pool_shapes.get(sig)
    if cached is not None:
        return cached
    requested = sig
    while True:
        live = probe(P)
        if live is None or live <= budget_bytes or P <= 1:
            break
        P = max(1, P // 2)
    _checked_pool_shapes[requested] = P
    _checked_pool_shapes[
        (P, H, W, cfg.num_catalogs, prior.num_counts, per_tile_bg)
    ] = P
    return P


def run_csmc_streaming(
    key,
    images,
    prior,
    model,
    kernel,
    cfg: SMCConfig,
    pool: int | None = None,
    budget_bytes: int = 12 * 2**30,
    return_info: bool = False,
    devices=None,
):
    """CS-SMC over ``images [T, h, w]`` with a streaming tile pool.

    ``pool``: number of resident tile slots (default: the
    ``max_tiles_per_chunk`` memory-model size, capped at T). Returns an
    ``SMCResult`` batched in the caller's tile order; with
    ``return_info=True`` also returns ``{"per_tile_iters", "steps",
    "pool"}`` — the exact billing base for throughput accounting
    (executed slot-steps = ``steps * pool``).

    ``devices``: optional device list / ``Mesh`` — the pool's slot axis
    shards over a 1-D tile mesh (parallel/sharding.py); the budget is
    per device, so the default pool also scales by the mesh size. Slot
    swaps use traced-index ``dynamic_update_slice`` on the sharded axis
    (the [1, ...] insert is replicated and each shard selects its rows),
    so swap programs stay schedule-independent and compile once.

    Restrictions vs ``run_csmc``: ``fixed_schedule`` and
    ``record_history`` are unsupported (both index a *global* iteration
    number that swapped-in tiles don't share).
    """
    if cfg.fixed_schedule is not None or cfg.record_history:
        raise ValueError(
            "run_csmc_streaming requires adaptive tempering and "
            "record_history=False (both index a global iteration number "
            "that swapped-in tiles don't share)"
        )
    T, H, W = images.shape
    n_dev = 1
    tiles_sharding = None
    if devices is not None:
        from smcdet_tpu.parallel.sharding import tile_mesh, tile_sharding

        mesh = tile_mesh(devices)
        n_dev = mesh.devices.size
        tiles_sharding = tile_sharding(mesh)
    if pool is None:
        pool = n_dev * max_tiles_per_chunk(
            prior, cfg.num_catalogs, H * W, budget_bytes
        )
    P = min(pool, max(T, 1))
    if n_dev > 1:
        # the slot axis shards over the mesh: round the pool to a mesh
        # multiple (pad slots fill in when tiles run short)
        P = max(n_dev, (P // n_dev) * n_dev)

    bg = jnp.asarray(model.background)
    per_tile_bg = is_per_tile_background(bg, T)
    if per_tile_bg:
        bg = normalize_per_tile_background(bg)

    if n_dev == 1:
        P = _measured_pool_check(
            P, images, bg, per_tile_bg, prior, model, kernel, cfg,
            budget_bytes,
        )

    # ------------------------------------------------------------------
    # host scheduler (one-step pipeline: flags of state_d are fetched
    # while the device executes the already-dispatched step d+1)
    # ------------------------------------------------------------------
    pool_images = pad_tiles(images, P)
    pool_bg = pad_tiles(bg, P) if per_tile_bg else bg
    if tiles_sharding is not None:
        pool_images = jax.device_put(pool_images, tiles_sharding)
        if per_tile_bg:
            pool_bg = jax.device_put(pool_bg, tiles_sharding)
    state = _init_jit(
        key, pool_images, prior, _model_for(model, pool_bg, per_tile_bg), cfg
    )

    # global tile index resident in each slot (-1 = pad or spent slot,
    # excluded from all accounting; pad slots repeat the last tile)
    slot_tile = [t if t < T else -1 for t in range(P)]
    insert_step = np.zeros(T, dtype=np.int64)  # dispatch idx at insertion
    iters = np.zeros(T, dtype=np.int64)
    results: dict[int, SMCResult] = {}
    finalized: set[int] = set()
    next_tile = min(P, T)
    in_flight, d_inflight = state, 0  # state_0: init's iteration-0 temper

    while len(finalized) < T:
        state, d = in_flight, d_inflight
        # speculative dispatch first so the flag transfer below overlaps
        # the device executing it
        in_flight = _step_jit(
            pool_images,
            prior,
            _model_for(model, pool_bg, per_tile_bg),
            kernel,
            cfg,
            state,
        )
        d_inflight = d + 1
        temps = np.asarray(state.temperature)

        for s in range(P):
            t = slot_tile[s]
            if t < 0:
                continue
            if temps[s] < 1.0 and (d - insert_step[t]) < cfg.max_smc_iters:
                continue
            # done (or at the iteration cap): finalize from THIS state —
            # exactly d - insert_step[t] iterations, never the
            # speculative step already in flight
            iters[t] = d - insert_step[t]
            results[t] = _finalize_slot(
                state, pool_bg, jnp.int32(s), prior, model, cfg, per_tile_bg
            )
            finalized.add(t)
            if next_tile < T:
                k_init = jax.random.fold_in(key, 1_000_000 + next_tile)
                bg1 = bg[next_tile] if per_tile_bg else None
                in_flight, pool_images, pool_bg = _insert_slot(
                    in_flight,
                    pool_images,
                    pool_bg,
                    jnp.int32(s),
                    k_init,
                    images[next_tile],
                    bg1,
                    prior,
                    model,
                    cfg,
                    per_tile_bg,
                )
                slot_tile[s] = next_tile
                # the insert lands in the in-flight state: its first step
                # is dispatch d_inflight + 1
                insert_step[next_tile] = d_inflight
                next_tile += 1
            else:
                slot_tile[s] = -1  # spent: keeps riding frozen

    # ------------------------------------------------------------------
    # stack per-tile results in caller order
    # ------------------------------------------------------------------
    parts = [results[t] for t in range(T)]
    stacked = {}
    for f in parts[0]._fields:
        vals = [getattr(p, f) for p in parts]
        if f == "history":
            stacked[f] = None
        elif f == "num_iters":
            stacked[f] = jnp.asarray(int(iters.max()), dtype=jnp.int32)
        else:
            stacked[f] = jnp.concatenate(vals, axis=0)
    result = SMCResult(**stacked)
    if return_info:
        return result, {
            "per_tile_iters": iters,
            "steps": d_inflight,
            "pool": P,
        }
    return result
