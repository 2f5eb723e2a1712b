#!/usr/bin/env python
"""Probe: does a single long-running device program die with UNAVAILABLE?

The cells_pair batch-7 crash (VERDICT r4 task 2) reproduces under the
classic kernel layout (~190 s single-dispatch SMC program) and not under
the ~2x faster packed layout (~98 s) — and batches 0-6, which converge in
fewer SMC iterations, pass under both. That pattern fits a *dispatch
duration* limit (tunnel/device watchdog), not a data-dependent kernel
fault (the fused kernel has no data-dependent indexing to fault on).

This probe runs one innocent jitted program — a fori_loop of matmuls, no
Pallas, no SMC — sized by --seconds, in a SINGLE dispatch. If it dies
with the same UNAVAILABLE "TPU device error" at the same timescale, the
batch-7 crash is an infrastructure duration limit; if it survives well
past 190 s, the kernel path is back under suspicion.

Usage: python probe_long_dispatch.py --seconds 240
"""

from __future__ import annotations

import argparse
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=float, default=240.0)
    parser.add_argument("--size", type=int, default=2048)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    n = args.size
    x = jnp.eye(n, dtype=jnp.float32) + 1e-3

    @jax.jit
    def burn(x, iters):
        def body(_, y):
            y = y @ x
            return y / jnp.maximum(jnp.abs(y).max(), 1e-30)
        return jax.lax.fori_loop(0, iters, body, x)

    # calibrate: time a short dispatch, scale the loop count
    t0 = time.time()
    jax.block_until_ready(burn(x, 200))
    dt = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(burn(x, 400))
    rate = 400 / (time.time() - t0)  # iters/s, compile amortized
    iters = int(args.seconds * rate)
    print(
        f"calibration: {rate:.0f} iters/s (first 200 took {dt:.1f}s with "
        f"compile); dispatching ONE {args.seconds:.0f}s program "
        f"({iters} iters)",
        flush=True,
    )
    t0 = time.time()
    out = burn(x, iters)
    try:
        jax.block_until_ready(out)
        print(
            f"SURVIVED: single dispatch ran {time.time() - t0:.0f}s "
            f"(checksum {float(out.sum()):.3e})",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001 — the probe exists to catch this
        print(
            f"DIED after {time.time() - t0:.0f}s: "
            f"{type(e).__name__}: {e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
