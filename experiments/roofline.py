#!/usr/bin/env python
"""Roofline / MFU for the fused MH sweep kernel (VERDICT r4 task 1).

The flagship Pallas kernel (ops/pallas_sweep.py) is a VPU program: per
single-component MH update it renders two radius-truncated SDSS-profile
star patches over the HW-pixel tile, re-evaluates the Gaussian
log-likelihood, and does O(M) slot bookkeeping — all element-wise math,
no MXU work. HBM traffic is one block copy in and out per *sweep call*
(~(4 HW + 6 M) * 4 bytes / num_iters per update — tens of bytes at
num_iters=100, far below one update's ~4.8 kFLOP of math), so the
binding resource is VPU arithmetic.

Op census (audited against the CURRENT kernel: wing_beta3 rsqrt wing,
gaussian noise, pareto flux, no bridge child — the bench config):

Per PIXEL (x HW), ops on [HW, P] tiles:
  star_image x2 (pallas_sweep.py star_image/psf_eval):
    dy/dx (2) + patch mask (6: sub/abs/cmp per axis) + r2 (3)
    + psf_eval (11: term1 mul, term2 mul+scale, qv 2, wing 3, combine 3)
    + masked select (2)                  = 24 flops; 2 exp + 1 rsqrt
  delta + rate_prop (4 + 2)              = 6 flops
  loglik(rate_prop) (var 2, resid 2, quad 2, logvar scale+subs 3,
    reduce-add 1)                        = 10 flops; 1 log
  accepted-rate blend                    = 3 flops
  -> 67 flops, 4 exp + 2 rsqrt + 1 log per pixel
Per UPDATE (x1), ops on [1, P] / [M=6, P]:
  5 uniforms (convert+scale+clip)        = 25 flops
  slot index j + active mask             = 14
  onehot + 3 masked sums over M          = 45
  3x tn_sample (2 ndtr ~21 fl + 1 exp each; interp+clip 5; ndtri 3
    + 1 erf_inv; x clip 4; mass 1)       = 165 flops; 6 exp + 3 erf_inv
  3x tn_log_mass at proposal             = 138 flops; 6 exp + 3 log
  3x log_mass_from                       = 12 flops; 3 log
  flux_log_prob x2 (pareto)              = 4 flops; 2 log
  lp_prop + log_alpha + accept           = 14 flops; 1 exp
  safe-flux selects                      = 4
  sel + state blends (3x[M,P] + 3x[1,P]) = 46
  -> 467 flops, 13 exp + 3 erf_inv + 8 log per update

The counts are "as written" after obvious constant folding (scalar
coefficients like -1/(2*sigma1) are loop-invariant); they are the
algorithm's op budget, not the compiler's emission, which is the right
numerator for an MFU figure.

Microbench design (what round 4 got wrong): the per-op-class VPU
ceilings are measured with INDEPENDENT single-vreg chains —

- each stream is one (8, 128) f32 block = exactly one vreg, so
  ``streams`` live values occupy ``streams`` vregs (round 4 used
  8 streams x 16 vregs = 128 live vregs, far over the register file —
  the measured 859 Gflop/s "ceiling" was mostly spill traffic);
- the chain body is unrolled UNROLL x inside the fori_loop so the
  scalar loop overhead amortizes;
- ``n_chain`` is autoscaled from a pilot run so each timed rep takes
  ~1.5 s — the ~25-50 ms axon-tunnel RPC inside the timed region
  (round 4's second bug: an ~80 ms rep was half RPC) becomes <4% —
  and a 2x-chain linearity check asserts the scaling is clean;
- exp / rsqrt / log are measured separately (the kernel's mix is not
  exp-only); erf_inv (3/update) is billed at the exp rate.

Ceilings reported:
  t_sum = F/R_fma + sum_k T_k/R_k   (no overlap between op classes —
                                     conservative, the true bound if
                                     everything shares the VPU issue
                                     slots)
  t_max = max(F/R_fma, sum_k T_k/R_k)  (perfect FMA/transcendental
                                     overlap — optimistic)
MFU ("utilization") is measured / ceiling_sum; utilization vs the
overlap ceiling is also reported. Outputs docs/results/roofline.json.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

HW = 64
M = 6

FLOPS_PER_PX = 2 * 24 + 6 + 10 + 3  # 67
FLOPS_PER_UPDATE = HW * FLOPS_PER_PX + 467

# transcendentals per update by class (erf_inv billed as exp)
EXP_PER_UPDATE = HW * 4 + 13 + 3
RSQRT_PER_UPDATE = HW * 2
LOG_PER_UPDATE = HW * 1 + 8

UNROLL = 8


def _chain_bench(kind: str, streams: int, n_chain: int,
                 interpret: bool = False, reps: int = 3):
    """(best_seconds, counted_ops) of ``streams`` independent
    dependent-op chains, each over one (8, 128) f32 vreg, ``n_chain``
    fori iterations x UNROLL ops."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def op(x):
        if kind == "fma":
            return x * 1.0000001 + 1e-9  # 2 flops
        if kind == "exp":
            return jnp.exp(-x)  # fixed point ~0.567
        if kind == "rsqrt":
            return jax.lax.rsqrt(x + 1.5)  # fixed point ~0.68
        if kind == "log":
            return jnp.log(x + 2.0)  # fixed point ~1.14 (glue: 1 add)
        raise ValueError(kind)

    def kernel(x_ref, o_ref):
        x0 = x_ref[...]
        init = tuple(x0 + jnp.float32(0.001) * k for k in range(streams))

        def body(i, xs):
            for _ in range(UNROLL):
                xs = tuple(op(x) for x in xs)
            return xs

        xs = jax.lax.fori_loop(0, n_chain, body, init)
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[...] = acc

    x = jnp.full((8, 128), 0.5, dtype=jnp.float32)
    inner = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )
    # reduce to a scalar INSIDE the jit so the timed fetch is one small
    # RPC that cannot complete before the kernel does
    run = jax.jit(lambda v: inner(v)[0, 0])
    float(run(x))  # compile + first execute
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    per_step = 2 if kind == "fma" else 1  # counted ops per chain step
    ops = streams * 8 * 128 * n_chain * UNROLL * per_step
    return best, ops


def _measure(kind: str, streams: int, interpret: bool,
             target_s: float = 1.5):
    """Rate + linearity check. Returns (ops_per_s, lin_ratio).

    Scales ``n_chain`` until one rep takes ~``target_s`` (so the ~25-50
    ms tunnel RPC inside the timed region is <4% of it), then reports
    the OVERHEAD-CANCELLED rate from the (n, 2n) pair:
    ``rate = ops(n) / (t(2n) - t(n))`` — any per-call fixed cost drops
    out of the difference. ``lin_ratio = t(2n)/t(n)`` should be ~2.0;
    a ratio well below 2 means fixed overhead still pollutes t(n)."""
    if interpret:
        t, ops = _chain_bench(kind, streams, 100, interpret, reps=1)
        return ops / t, 2.0
    n_chain = 200_000 if kind == "fma" else 50_000
    for _ in range(4):
        t, ops = _chain_bench(kind, streams, n_chain, reps=1)
        if 0.7 * target_s <= t <= 2.5 * target_s:
            break
        n_chain = max(int(n_chain * target_s / t), 1_000)
    t1, ops1 = _chain_bench(kind, streams, n_chain)
    t2, ops2 = _chain_bench(kind, streams, 2 * n_chain)
    rate = (ops2 - ops1) / max(t2 - t1, 1e-9)
    return rate, t2 / t1


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--updates-per-s", type=float, default=323.8e6,
        help="measured sweep throughput to compare against the ceiling "
        "(pass the fresh bench.py number; default: the round-4 "
        "full-frame north-star measurement, BENCH_r04.json)")
    parser.add_argument(
        "--streams", type=int, default=16,
        help="independent single-vreg chains in flight (16 vregs live; "
        "enough ILP to fill the VPU pipeline without spilling)")
    parser.add_argument(
        "--interpret", action="store_true",
        help="pallas interpret mode (CPU smoke test of the harness; "
        "the measured rates are meaningless off-chip)")
    args = parser.parse_args()

    import jax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform

    rates, lin = {}, {}
    for kind in ("fma", "exp", "rsqrt", "log"):
        rates[kind], lin[kind] = _measure(
            kind, args.streams, args.interpret
        )
    # the log chain carries one glue add per step: refund it at R_fma
    # (an add is half an fma's 2 counted flops). A non-positive refunded
    # time means the differenced timings are noise (e.g. interpret/CPU
    # smoke mode) — fail loudly rather than emit a ~1e15 op/s "rate"
    # that silently corrupts the ceiling and MFU.
    for kind in ("log", "rsqrt"):
        t_k = 1.0 / rates[kind] - 1.0 / rates["fma"]
        if t_k <= 0:
            raise RuntimeError(
                f"roofline measurement invalid: refunded {kind} time "
                f"<= 0 (R_{kind}={rates[kind]:.3g}, "
                f"R_fma={rates['fma']:.3g}) — the microbench timings "
                "are too noisy to separate the glue add; rerun (longer "
                "--streams) or don't trust this platform's numbers"
            )
        rates[kind] = 1.0 / t_k

    measured = args.updates_per_s
    t_fma = FLOPS_PER_UPDATE / rates["fma"]
    t_trans = (
        EXP_PER_UPDATE / rates["exp"]
        + RSQRT_PER_UPDATE / rates["rsqrt"]
        + LOG_PER_UPDATE / rates["log"]
    )
    t_sum = t_fma + t_trans  # no FMA/transcendental overlap
    t_max = max(t_fma, t_trans)  # perfect overlap
    ceiling_sum = 1.0 / t_sum
    ceiling_max = 1.0 / t_max

    report = {
        "platform": platform,
        "streams": args.streams,
        "vpu_fma_gops": round(rates["fma"] / 1e9, 1),
        "vpu_exp_gops": round(rates["exp"] / 1e9, 1),
        "vpu_rsqrt_gops": round(rates["rsqrt"] / 1e9, 1),
        "vpu_log_gops": round(rates["log"] / 1e9, 1),
        "linearity_check": {k: round(v, 3) for k, v in lin.items()},
        "flops_per_update": FLOPS_PER_UPDATE,
        "exp_per_update": EXP_PER_UPDATE,
        "rsqrt_per_update": RSQRT_PER_UPDATE,
        "log_per_update": LOG_PER_UPDATE,
        "measured_updates_per_s_millions": round(measured / 1e6, 1),
        "ceiling_updates_per_s_millions_no_overlap": round(
            ceiling_sum / 1e6, 1
        ),
        "ceiling_updates_per_s_millions_overlap": round(
            ceiling_max / 1e6, 1
        ),
        "utilization_vs_no_overlap": round(measured / ceiling_sum, 3),
        "utilization_vs_overlap": round(measured / ceiling_max, 3),
        "fma_share_of_no_overlap_bound": round(t_fma / t_sum, 3),
    }
    if platform == "tpu":
        out = Path(__file__).resolve().parents[1] / "docs" / "results"
        out.mkdir(parents=True, exist_ok=True)
        path = out / "roofline.json"
    else:
        # CPU/interpret smoke runs must never clobber the committed
        # on-chip numbers that PERF.md's MFU section cites
        path = Path("/tmp/roofline_smoke.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
