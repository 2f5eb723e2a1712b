#!/usr/bin/env python
"""Roofline for the fused MH sweep kernel (VERDICT r3 weak #5 / task 7).

The flagship Pallas kernel (ops/pallas_sweep.py) is a VPU program: per
single-component MH update it renders two radius-truncated SDSS-profile
star patches over the HW-pixel tile, re-evaluates the Gaussian
log-likelihood, and does O(M) slot bookkeeping — all element-wise math,
no MXU work. The binding resource is therefore VPU arithmetic (the
carries live in VMEM/vregs; HBM traffic is one block copy in and out per
*sweep call*, i.e. ~(4 HW + 6 M) * 4 bytes / num_iters per update — tens
of bytes at num_iters=100, far below one update's ~4.7 kFLOP of math).

This script measures the chip's empirical VPU ceilings with two
microkernels over the same [HW, P] f32 block layout the sweep uses:

- ``fma``: a dependent multiply-add chain (peak arithmetic throughput);
- ``exp``: a dependent ``exp`` chain (transcendental throughput — the
  sweep's SDSS profile costs 3 exp + 1 log per pixel per render).

and combines them with the kernel's counted op mix (constants below,
audited against ops/pallas_sweep.py) into a speed-of-light bound:

    t_update >= FMA_OPS / R_fma + TRANS_OPS / R_trans

Reported utilization = measured updates/s * t_update. Outputs one JSON
to docs/results/roofline.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# ---- counted per-update op mix (bench config: 8x8 tile HW=64, SDSS
# PSF, gaussian noise, pareto flux, no bridge child) -------------------
# Per PIXEL (x HW):
#   star_image x2:  dy/dx/r2 (5) + sdss psf_eval (11) + patch mask (7)
#                   = 23 flops + 3 exp + 1 log  ... x2 calls
#   delta + rate_prop: 6 flops
#   loglik(rate_prop): 9 flops + 1 log + 1 (reduction add)
#   accepted-state blends (rate): 3 flops
# Per UPDATE (x1):
#   slot select + onehot gathers + sel updates: ~100 flops (M=6)
#   3x truncnorm sample (2 ndtr + ndtri each): ~150 flops + 6 exp
#   3x truncnorm reverse mass + logs:          ~80 flops + 6 exp + 3 log
#   flux log-prob pair, log_alpha, accept:     ~30 flops + 1 exp + 2 log
HW = 64
FLOPS_PER_PX = 2 * 23 + 6 + 10 + 3  # 65
TRANS_PER_PX = 2 * (3 + 1) + 1  # 9 (exp+log counted equally)
FLOPS_PER_UPDATE = HW * FLOPS_PER_PX + 360
TRANS_PER_UPDATE = HW * TRANS_PER_PX + 18


def _microbench(
    kind: str, n_chain: int, grid: int, hw: int, p: int,
    interpret: bool = False, streams: int = 8,
):
    """Gops/s of ``streams`` independent op chains over [hw, p] f32
    blocks.

    A SINGLE dependent chain is latency-bound — measured 964 Gflop/s on
    v5e, ~8x below the VPU's pipelined peak, which put the round-4
    "ceiling" at a third of the sweep kernel's MEASURED throughput.
    The real kernel has abundant ILP (independent pixels, slots and
    particles in flight), so the relevant ceiling is the pipelined
    rate: run several independent chains so the VPU pipeline fills.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        x0 = x_ref[...]
        init = tuple(x0 + jnp.float32(0.001) * k for k in range(streams))

        def body(i, xs):
            if kind == "fma":
                # 2 flops per element per step per stream
                return tuple(x * 1.0000001 + 1e-9 for x in xs)
            # one transcendental per element per step; the negation
            # keeps the chain in (0, 1] so it neither over- nor
            # underflows across the loop
            return tuple(jnp.exp(-x) for x in xs)

        xs = jax.lax.fori_loop(0, n_chain, body, init)
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[...] = acc

    x = jnp.full((grid, hw, p), 0.5, dtype=jnp.float32)
    inner = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, hw, p), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, hw, p), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid, hw, p), jnp.float32),
        interpret=interpret,
    )
    # reduce to a scalar INSIDE the jit so the timed fetch is one small
    # RPC that cannot complete before the kernel does. Timing the bare
    # dispatch (round-3 bug) measured the async-dispatch latency, not
    # the kernel: block_until_ready over the axon tunnel returned in
    # ~30 us and reported a 9.6 Pflop/s "VPU" (docs/PERF.md roofline).
    run = jax.jit(lambda v: inner(v)[0, 0, 0])
    float(run(x))  # compile + first execute
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))  # blocks on the scalar: kernel + one ~25-50 ms RPC
        best = min(best, time.perf_counter() - t0)
    ops = streams * grid * hw * p * n_chain * (2 if kind == "fma" else 1)
    return ops / best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--updates-per-s", type=float, default=330e6,
                        help="measured sweep throughput to compare "
                        "against the ceiling (pass the fresh bench.py "
                        "number; default: the round-3 sorted-chunk "
                        "full-frame measurement, docs/PERF.md)")
    parser.add_argument(
        "--n-chain", type=int, default=1024,
        help="fma chain length (sized for ~10 s/rep on v5e across the "
        "8 ILP streams; the exp chain runs n_chain/4 since "
        "transcendentals are ~4-8x slower)")
    parser.add_argument("--grid", type=int, default=256)
    parser.add_argument("--p", type=int, default=256)
    parser.add_argument(
        "--interpret", action="store_true",
        help="pallas interpret mode (CPU smoke test of the harness; "
        "the measured rates are meaningless off-chip)",
    )
    args = parser.parse_args()

    import jax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform
    r_fma = _microbench(
        "fma", args.n_chain, args.grid, HW, args.p, args.interpret
    )
    r_trans = _microbench(
        "exp", max(args.n_chain // 4, 64), args.grid, HW, args.p,
        args.interpret,
    )

    measured = args.updates_per_s
    t_bound = (
        FLOPS_PER_UPDATE / r_fma + TRANS_PER_UPDATE / r_trans
    )  # seconds per update at the speed of light
    ceiling = 1.0 / t_bound
    util = measured / ceiling

    report = {
        "platform": platform,
        "vpu_fma_gops": round(r_fma / 1e9, 1),
        "vpu_transcendental_gops": round(r_trans / 1e9, 1),
        "flops_per_update": FLOPS_PER_UPDATE,
        "transcendentals_per_update": TRANS_PER_UPDATE,
        "measured_updates_per_s": round(measured / 1e6, 1),
        "ceiling_updates_per_s": round(ceiling / 1e6, 1),
        "utilization": round(util, 3),
        "fma_share_of_bound": round(
            (FLOPS_PER_UPDATE / r_fma) / t_bound, 3
        ),
    }
    out = Path(__file__).resolve().parents[1] / "docs" / "results"
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "roofline.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
