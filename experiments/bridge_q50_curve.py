#!/usr/bin/env python
"""Settle the fused-bridge q50 question (VERDICT r4 task 4).

Round 4 loosened the fused-vs-XLA bridge equilibrium comparison from
q50/q75 to q75/q90 after a ~95-nat on-chip q50 gap, attributing the gap
to warm-up (the XLA arm's own seed-to-seed q50 spread was 110-198 nats
at 800 sweeps). That attribution predicts the gap SHRINKS with more
sweeps; a real lower-tail bias in the fused kernel would not. This
script measures |q50_fused - q50_XLA| (and q25) against sweeps, with
the per-backend seed spread at each rung as the yardstick, and writes
docs/results/bridge_q50_curve.json for the test to cite.

Setup mirrors tests/test_pallas.py::TestFusedMALAOnTPU::
test_matches_xla_equilibrium_bridge (tag mode, tau=0.5 bridge target:
logprior + 0.5*parent_ll + 0.5*child_ll; reference semantics
/root/reference/smcdet/aggregate.py:105-130).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--sweeps", type=int, nargs="+", default=[800, 1600, 3200, 6400]
    )
    parser.add_argument("--seeds", type=int, nargs="+", default=[5, 6, 7])
    parser.add_argument(
        "--backends", nargs="+", default=["xla", "pallas"],
        help="subset for smoke tests (the pallas arm needs a TPU)",
    )
    parser.add_argument(
        "--out", default=str(REPO / "docs/results/bridge_q50_curve.json")
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from test_pallas import TestFusedSweepOnTPU

    from smcdet_tpu.inference.aggregate import _side_mask_fn
    from smcdet_tpu.inference.kernels import (
        SingleComponentMALA,
        init_kernel_state,
    )

    helper = TestFusedSweepOnTPU()
    kernel_mh, ctx, counts, locs, fluxes, model, prior, images = (
        helper._setup("gaussian")
    )
    side_mask = _side_mask_fn(1, 4, model.height, model.width)
    sides = (jnp.arange(fluxes.shape[-1]) % 2).astype(jnp.float32)
    ctx = ctx.replace(
        temperature=jnp.full((2, 1, 1), 0.5),
        child_model=model,
        child_side_mask=side_mask,
        child_slot_side=jnp.broadcast_to(sides, fluxes.shape),
        child_ghost_rate=jnp.zeros(
            fluxes.shape[:-1] + (model.height * model.width,)
        ),
    )

    def bridge_target(st):
        return np.asarray(
            st.logprior + 0.5 * st.parent_ll + 0.5 * st.child_ll
        ).ravel()

    quantiles = (10, 25, 50, 75, 90)
    # Chain sweeps in bounded blocks through run_from_state (caches carry
    # across blocks, so k blocks of B sweeps == one kB-sweep run up to
    # the PRNG key schedule): this environment kills any single device
    # program at ~200 s (experiments/probe_long_dispatch.py), which a
    # 6400-sweep XLA dispatch would exceed.
    BLOCK = 800
    rungs = []
    for sweeps in args.sweeps:
        kx = SingleComponentMALA(
            num_iters=min(sweeps, BLOCK),
            locs_step=jnp.float32(0.12),
            fluxes_step=jnp.float32(2.0),
            fluxes_min=kernel_mh.fluxes_min,
            fluxes_max=kernel_mh.fluxes_max,
            backend="xla",
        )
        kp = kx.replace(backend="pallas")
        n_blocks = -(-sweeps // BLOCK)
        # a rung > BLOCK executes n_blocks * BLOCK sweeps; label it with
        # the EXECUTED count so the curve's x-axis is never mislabeled
        # for a requested value that isn't a multiple of BLOCK
        sweeps = n_blocks * min(sweeps, BLOCK)
        per_backend = {}
        arms = [a for a in (("xla", kx), ("pallas", kp))
                if a[0] in args.backends]
        for name, k in arms:
            run_block = jax.jit(
                lambda key, st, k=k: k.run_from_state(key, ctx, counts, st)
            )
            qs, accs = [], []
            t0 = time.time()
            for seed in args.seeds:
                st = init_kernel_state(ctx, counts, locs, fluxes)
                acc_blocks = []
                for b in range(n_blocks):
                    st, acc = run_block(
                        jax.random.fold_in(jax.random.key(seed), b), st
                    )
                    st = jax.block_until_ready(st)
                    acc_blocks.append(float(np.asarray(acc).mean()))
                lt = bridge_target(st)
                qs.append([float(np.percentile(lt, q)) for q in quantiles])
                accs.append(float(np.mean(acc_blocks)))
            qs = np.asarray(qs)  # [seeds, quantiles]
            per_backend[name] = {
                "q_mean": qs.mean(0).tolist(),
                "q_spread": (qs.max(0) - qs.min(0)).tolist(),
                "acc_mean": float(np.mean(accs)),
                "wall_s": round(time.time() - t0, 1),
            }
        rung = {
            "sweeps": sweeps,
            "quantiles": list(quantiles),
            **per_backend,
        }
        if len(per_backend) == 2:
            gap = [
                abs(a - b)
                for a, b in zip(
                    per_backend["xla"]["q_mean"],
                    per_backend["pallas"]["q_mean"],
                )
            ]
            rung["backend_gap_nats"] = [round(g, 2) for g in gap]
            print(
                f"sweeps={sweeps}: gap(q10..q90)="
                f"{[round(g, 1) for g in gap]} xla_spread="
                f"{[round(s, 1) for s in per_backend['xla']['q_spread']]} "
                f"pallas_spread="
                f"{[round(s, 1) for s in per_backend['pallas']['q_spread']]}",
                flush=True,
            )
        else:
            print(f"sweeps={sweeps}: {json.dumps(per_backend)}", flush=True)
        rungs.append(rung)

    # Verdict: warm-up attribution holds iff the q50 backend gap at the
    # longest rung is within the same-backend seed spread there.
    verdict = None
    last = rungs[-1]
    if "backend_gap_nats" in last:
        i50 = list(quantiles).index(50)
        spread = max(
            last["xla"]["q_spread"][i50], last["pallas"]["q_spread"][i50]
        )
        gap50 = last["backend_gap_nats"][i50]
        verdict = {
            "q50_gap_at_longest_rung_nats": gap50,
            "max_seed_spread_there_nats": round(spread, 2),
            "warmup_attribution_confirmed": bool(gap50 <= max(spread, 5.0)),
        }
    out = {
        "platform": jax.devices()[0].platform,
        "seeds": args.seeds,
        "rungs": rungs,
        "verdict": verdict,
    }
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(verdict), flush=True)


if __name__ == "__main__":
    main()
