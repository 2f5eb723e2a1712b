#!/usr/bin/env python
"""Attribute the per-SMC-iteration cost on real hardware.

Round-1 measurement: at the M71 bench config (T=16 tiles, C=7 strata,
N=2048 catalogs, 100 MH sweeps/iter) each SMC iteration costs ~100 ms of
which the 100 mutation sweeps are only ~65 ms — a ~35-44 ms fixed
overhead that ablating any single stage did not move (VERDICT r1 weak #3).

This script measures each stage of ``run_csmc``'s loop body in isolation
on the current default device, inside a jitted ``lax.scan`` whose carry is
data-dependent on the stage output (so XLA cannot hoist the work out of
the loop) — standalone calls through the axon tunnel measure mostly
RPC latency. It also fits total-per-iteration cost as the slope of
wall time vs iteration count using fixed tempering ladders of different
lengths, which needs no instrumentation inside the loop at all.

Usage: python experiments/profile_iteration.py [--reps 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(step_fn, carry, reps, key=jax.random.key(0)):
    """Wall time per call of ``step_fn(key, carry) -> carry`` inside a
    jitted scan (compile excluded, output fully consumed)."""

    @jax.jit
    def run(keys, carry):
        def body(c, k):
            return step_fn(k, c), None

        c, _ = jax.lax.scan(body, carry, keys)
        return c

    keys = jax.random.split(key, reps)
    out = jax.block_until_ready(run(keys, carry))
    start = time.perf_counter()
    out = jax.block_until_ready(run(keys, carry))
    return (time.perf_counter() - start) / reps, out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reps", type=int, default=30)
    parser.add_argument("--num-tiles", type=int, default=16)
    parser.add_argument("--num-catalogs", type=int, default=2048)
    args = parser.parse_args()

    from bench import build_problem
    from smcdet_tpu.inference.kernels import (
        TargetContext,
        init_kernel_state,
    )
    from smcdet_tpu.inference.smc import SMCConfig, run_csmc
    from smcdet_tpu.ops.resampling import (
        gather_particles,
        resample_indices,
    )
    from smcdet_tpu.ops.tempering import solve_tempering_step

    images, prior, model, kernel, cfg = build_problem(
        num_tiles=args.num_tiles, num_catalogs=args.num_catalogs
    )
    T, C, N = args.num_tiles, prior.num_counts, args.num_catalogs
    print(f"device: {jax.devices()[0]}  T={T} C={C} N={N}", file=sys.stderr)

    key = jax.random.key(1)
    strata, locs, fluxes = prior.sample_stratified(key, N, batch_shape=(T,))
    counts_b = jnp.broadcast_to(strata[None, :, None], (T, C, N))
    temperature = jnp.full((T,), 0.5)
    ctx = TargetContext(
        prior=prior,
        model=model,
        image=images[:, None, None],
        temperature=temperature[:, None, None],
    )
    ks = jax.jit(init_kernel_state)(ctx, counts_b, locs, fluxes)
    weights = jax.nn.softmax(
        0.1 * jax.random.normal(jax.random.key(2), (T, C, N))
    )

    results = {}

    # -- stage: resampling index draw ----------------------------------
    def stage_resample(k, w):
        idx = resample_indices(k, w, N, cfg.resample_method)
        return w * (1.0 + 1e-9 * idx.astype(jnp.float32))

    results["resample_indices"], _ = scan_time(
        stage_resample, weights, args.reps
    )

    # -- stage: particle gather (one-hot matmul path) ------------------
    def stage_gather(k, c):
        lo, fl = c
        idx = jax.random.randint(k, (T, C, N), 0, N)
        lo2, fl2 = gather_particles(idx, lo, fl, particle_axis=2)
        return (lo2, fl2)

    results["gather_particles"], _ = scan_time(
        stage_gather, (locs, fluxes), args.reps
    )

    # -- stage: cache re-render (init_kernel_state) --------------------
    def stage_render(k, c):
        lo, fl = c
        s = init_kernel_state(ctx, counts_b, lo, fl)
        bump = 1e-12 * (
            s.rate.sum() + s.parent_ll.sum() + s.logprior.sum()
        )
        return (lo + bump, fl)

    results["init_kernel_state"], _ = scan_time(
        stage_render, (locs, fluxes), args.reps
    )

    # -- stage: tempering bisection ------------------------------------
    def stage_temper(k, ll):
        delta = solve_tempering_step(ll, temperature[:, None], 0.5 * N)
        return ll * (1.0 + 1e-9 * delta[..., None])

    results["solve_tempering_step"], _ = scan_time(
        stage_temper, ks.parent_ll, args.reps
    )

    # -- stage: weight/logZ update math --------------------------------
    def stage_weights(k, ll):
        delta = jnp.float32(0.01)
        w_log = delta * ll
        m = w_log.max(-1)
        shifted = jnp.exp(w_log - m[..., None])
        s = shifted.sum(-1)
        w = shifted / s[..., None]
        ess = 1.0 / (w**2).sum(-1)
        return ll * (1.0 + 1e-9 * ess[..., None])

    results["weight_update"], _ = scan_time(
        stage_weights, ks.parent_ll, args.reps
    )

    # -- stage: mutation (100 sweeps) ----------------------------------
    def stage_mutate(k, c):
        st, _ = kernel.run_from_state(k, ctx, counts_b, c)
        return st

    results["mutate_100_sweeps"], _ = scan_time(
        stage_mutate, ks, max(args.reps // 3, 5)
    )

    # -- slope fit: total cost per iteration via fixed ladders ---------
    def total_time(n_iters):
        # n+1 ladder entries -> n loop iterations (the init temper step
        # consumes the first entry before the loop starts)
        sched = tuple(np.linspace(0.0, 1.0, n_iters + 2)[1:].tolist())
        c = SMCConfig(
            num_catalogs=N,
            ess_threshold_prop=cfg.ess_threshold_prop,
            resample_method=cfg.resample_method,
            max_smc_iters=max(n_iters + 8, 40),
            flux_detection_threshold=cfg.flux_detection_threshold,
            fixed_schedule=sched,
        )
        run = jax.jit(run_csmc)
        out = jax.block_until_ready(
            run(jax.random.key(3), images, prior, model, kernel, c)
        )
        start = time.perf_counter()
        out = jax.block_until_ready(
            run(jax.random.key(4), images, prior, model, kernel, c)
        )
        dt = time.perf_counter() - start
        assert int(out.num_iters) == n_iters, int(out.num_iters)
        return dt

    lo_iters, hi_iters = 8, 24
    t_lo = total_time(lo_iters)
    t_hi = total_time(hi_iters)
    per_iter = (t_hi - t_lo) / (hi_iters - lo_iters)
    fixed = t_lo - lo_iters * per_iter

    # -- adaptive wall: the bench's exact path, repeated ----------------
    run = jax.jit(run_csmc)
    out = jax.block_until_ready(
        run(jax.random.key(0), images, prior, model, kernel, cfg)
    )
    adaptive = []
    for r in range(3):
        start = time.perf_counter()
        out = jax.block_until_ready(
            run(jax.random.key(1 + r), images, prior, model, kernel, cfg)
        )
        adaptive.append((time.perf_counter() - start, int(out.num_iters)))

    print(f"\n{'stage':<28}{'ms/iter':>10}")
    for k, v in results.items():
        print(f"{k:<28}{v * 1e3:>10.2f}")
    accounted = sum(results.values())
    print(f"{'sum of stages':<28}{accounted * 1e3:>10.2f}")
    print(f"{'total (slope fit)':<28}{per_iter * 1e3:>10.2f}")
    print(f"{'unattributed':<28}{(per_iter - accounted) * 1e3:>10.2f}")
    print(f"{'init+final (intercept)':<28}{fixed * 1e3:>10.2f}  ms total")
    for dt, n in adaptive:
        extra = (dt - fixed) / n - per_iter
        print(
            f"adaptive wall: {dt:.3f}s over {n} iters "
            f"({dt / n * 1e3:.1f} ms/iter; adaptive-only overhead "
            f"{extra * 1e3:+.1f} ms/iter vs fixed ladder)"
        )


if __name__ == "__main__":
    main()
