"""Headline benchmark: single-component particle updates per second.

Workload mirrors the reference's M71 configuration
(/root/reference/experiments/m71/run_smc.py:49-96; manuscript.tex:560-568):
8x8-pixel tiles, SDSS-style PSF radius 8, truncated-Pareto fluxes, count
strata s in {0..6}, 100 MH sweeps per SMC iteration. The reference achieves
~20-60 s per tile at N=10,000 catalogs/count on an RTX 2080 Ti — of order
6e6 single-component proposal updates per second (BASELINE.md "derived
throughput estimate"). We count the same quantity: one update = one
single-component MH proposal (propose + incremental re-render + accept) for
one catalog, i.e. ``tiles x strata x catalogs_per_stratum x mh_sweeps x
smc_iterations / wall_seconds``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_UPDATES_PER_SEC = 6.0e6  # BASELINE.md derived estimate (RTX 2080 Ti)

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))"
)


def wait_for_backend(
    max_wait: float | None = None, probe_timeout: float = 120.0
) -> None:
    """Block until the accelerator backend answers a tiny matmul, with
    bounded exponential backoff.

    The TPU tunnel this repo benches through fails transiently in two
    modes — backend init raising ``UNAVAILABLE`` and ``jax.devices()``
    hanging outright — and a single transient failure at capture time
    has previously erased a whole round's perf evidence (BENCH_r03
    rc=1). The probe therefore runs in a *subprocess* with a hard
    timeout (a hang in-process would be unrecoverable) and retries
    until ``max_wait`` (env ``SMCDET_BENCH_BACKEND_WAIT``, default
    900 s) elapses, then raises.
    """
    if max_wait is None:
        max_wait = float(os.environ.get("SMCDET_BENCH_BACKEND_WAIT", "900"))
    deadline = time.monotonic() + max_wait
    delay = 15.0
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                timeout=probe_timeout,
                capture_output=True,
                text=True,
            )
            if proc.returncode == 0:
                if attempt > 1:
                    print(
                        f"backend recovered on attempt {attempt}",
                        file=sys.stderr,
                    )
                return
            err = (proc.stderr or "").strip().splitlines()
            reason = err[-1] if err else f"rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            reason = f"probe hung >{probe_timeout:.0f}s"
        if time.monotonic() + delay > deadline:
            raise RuntimeError(
                f"accelerator backend unavailable after {attempt} probe(s) "
                f"over {max_wait:.0f}s; last failure: {reason}"
            )
        print(
            f"backend probe {attempt} failed ({reason}); "
            f"retrying in {delay:.0f}s",
            file=sys.stderr,
        )
        time.sleep(delay)
        delay = min(delay * 2, 120.0)


def build_problem(num_tiles=16, num_catalogs=2048, mh_steps=100, max_smc_iters=100):
    from smcdet_tpu.inference.kernels import SingleComponentMH
    from smcdet_tpu.inference.smc import SMCConfig
    from smcdet_tpu.models.imaging import M71ImageModel
    from smcdet_tpu.models.priors import M71Prior
    from smcdet_tpu.models.simulate import generate_images

    tile = 8
    # Fitted M71 hyperparameters (BASELINE.md; manuscript.tex:564).
    prior = M71Prior(
        min_objects=0,
        max_objects=6,
        counts_rate=0.03,
        image_height=tile,
        image_width=tile,
        flux_alpha=0.214,
        flux_lower=0.252,
        flux_upper=1804.679,
        pad=1.0,
    )
    model = M71ImageModel(
        image_height=tile,
        image_width=tile,
        background=179.0,
        adu_per_nmgy=155.0,
        psf_params=(1.33, 4.82, 3.15, 3.0, 0.06, 0.002),
        psf_radius=8,
        noise_additive=0.0,
        noise_multiplicative=1.94,
    )
    kernel = SingleComponentMH(
        num_iters=mh_steps,
        locs_stdev=jnp.float32(0.25),
        fluxes_stdev=jnp.float32(5.0),
        fluxes_min=jnp.float32(0.252),
        fluxes_max=jnp.float32(1804.679),
    )
    cfg = SMCConfig(
        num_catalogs=num_catalogs,
        ess_threshold_prop=0.5,
        resample_method="systematic",
        max_smc_iters=max_smc_iters,
        flux_detection_threshold=0.7,
    )
    sim = generate_images(
        jax.random.key(7),
        prior,
        model,
        flux_threshold=0.7,
        loc_threshold_lower=0.0,
        loc_threshold_upper=float(tile),
        num_images=num_tiles,
    )
    return sim.images, prior, model, kernel, cfg


def main_streaming(num_tiles, num_catalogs, mh_steps, pool):
    """Streaming-pool variant of the north-star measurement
    (inference/streaming.py): a persistent ``pool``-slot tile pool with
    host-scheduled swap-on-converge, removing the chunk-max iteration
    waste entirely. Billed updates are the *executed* slot-steps
    (frozen/speculative slots included), the same accounting basis as
    the chunked path's chunk-max billing."""
    import time as _time

    from smcdet_tpu.inference.streaming import run_csmc_streaming

    images, prior, model, kernel, cfg = build_problem(
        num_tiles=num_tiles, num_catalogs=num_catalogs, mh_steps=mh_steps
    )
    C = prior.num_counts

    # warm-up: compile all four streaming programs (init/step/finalize/
    # insert — module-level jits, so the cache carries to the timed run);
    # pool+2 tiles force at least one swap so the insert path compiles
    warm, _ = run_csmc_streaming(
        jax.random.key(0), images[: pool + 2], prior, model, kernel, cfg,
        pool=pool, return_info=True,
    )
    jax.block_until_ready(warm.temperature)

    start = _time.perf_counter()
    result, info = run_csmc_streaming(
        jax.random.key(1), images, prior, model, kernel, cfg,
        pool=pool, return_info=True,
    )
    jax.block_until_ready(result.temperature)
    elapsed = _time.perf_counter() - start

    assert float(jnp.max(jnp.abs(result.temperature - 1.0))) < 1e-6
    ess = jnp.min(result.ess) / num_catalogs
    updates = info["steps"] * info["pool"] * C * num_catalogs * mh_steps
    updates_per_sec = updates / elapsed
    tiles_per_sec = num_tiles / elapsed
    print(
        json.dumps(
            {
                "metric": "single-component particle updates/sec/chip "
                f"(M71 full-frame streaming pool={pool}: {num_tiles} "
                f"tiles, N={num_catalogs}/stratum, C={C}, {mh_steps} MH "
                f"sweeps/iter, {elapsed:.2f}s wall)",
                "value": updates_per_sec,
                "unit": "updates/sec",
                "vs_baseline": updates_per_sec / REFERENCE_UPDATES_PER_SEC,
                "tiles_per_sec_to_target_ess": tiles_per_sec,
                "min_final_ess_prop": float(ess),
                "reference_tiles_per_sec": 0.025,
                "mean_tile_iters": float(info["per_tile_iters"].mean()),
                "slot_steps": int(info["steps"] * info["pool"]),
            }
        )
    )


def main():
    """North-star configuration (BASELINE.json): N=4096 catalogs/stratum
    over the full M71 frame workload — the reference's 332 checkerboard
    cutouts (manuscript.tex:560-562) — processed in tile chunks sized to
    the chip's memory. Reports BOTH BASELINE.json metrics: particle
    updates/sec/chip (headline, vs the reference's derived 6e6/s) and
    tiles/sec-to-target-ESS (every tile finishes tempered to 1 with the
    adaptive resampler holding ESS at ess_threshold_prop x N)."""
    wait_for_backend()

    from smcdet_tpu.inference.smc import run_csmc

    if "--streaming" in sys.argv:
        pool = 28
        for a in sys.argv:
            if a.startswith("--pool="):
                pool = int(a.split("=")[1])
        quick = "--quick" in sys.argv
        main_streaming(
            num_tiles=16 if quick else 332,
            num_catalogs=2048 if quick else 4096,
            mh_steps=100,
            pool=min(pool, 16) if quick else pool,
        )
        return

    quick = "--quick" in sys.argv
    num_tiles = 16 if quick else 332
    num_catalogs = 2048 if quick else 4096
    chunk = 16 if quick else 14
    mh_steps = 100
    images, prior, model, kernel, cfg = build_problem(
        num_tiles=num_tiles, num_catalogs=num_catalogs, mh_steps=mh_steps
    )
    C = prior.num_counts

    # Difficulty-ordered chunking (the ``sort_tiles`` option of
    # ``run_csmc_chunked``): inside a jitted chunk every tile runs to the
    # chunk-max adaptive-tempering length, so grouping similar-brightness
    # tiles makes chunks iteration-homogeneous. Measured on the 332-tile
    # frame at N=4096: 4.49 -> 8.00 tiles/s with updates/s within 2%
    # (docs/PERF.md chunk-size sweep).
    order = jnp.argsort(jnp.sum(images, axis=(1, 2)))
    images = images[order]

    n_chunks = -(-num_tiles // chunk)
    pad = n_chunks * chunk - num_tiles
    if pad:
        images = jnp.concatenate(
            [images, jnp.broadcast_to(images[-1:], (pad,) + images.shape[1:])]
        )

    run = jax.jit(run_csmc)
    # Warm-up / compile on the first chunk's shape (all chunks equal).
    warm = run(jax.random.key(0), images[:chunk], prior, model, kernel, cfg)
    jax.block_until_ready(warm)
    # Keep host<->device round-trips OUT of the timed region: every
    # ``int()``/``float()`` on a device array is a tunnel RPC (~hundreds
    # of ms each through the axon proxy) that would be billed as compute.
    diags = []
    start = time.perf_counter()
    for c in range(n_chunks):
        result = run(
            jax.random.key(1 + c),
            images[c * chunk : (c + 1) * chunk],
            prior,
            model,
            kernel,
            cfg,
        )
        jax.block_until_ready(result)
        # keep only the tiny diagnostic leaves; the big catalog buffers
        # free when `result` rebinds, so chunks don't accumulate in HBM
        diags.append((result.num_iters, result.temperature, result.ess))
    elapsed = time.perf_counter() - start

    updates = 0
    min_final_ess_prop = float("inf")
    for c, (num_iters, temperature, ess) in enumerate(diags):
        # bill only real (non-padding) tiles in the final chunk
        real = chunk if c < n_chunks - 1 else chunk - pad
        updates += real * C * num_catalogs * mh_steps * int(num_iters)
        assert float(jnp.max(jnp.abs(temperature - 1.0))) < 1e-6
        min_final_ess_prop = min(
            min_final_ess_prop, float(jnp.min(ess)) / num_catalogs
        )

    updates_per_sec = updates / elapsed
    tiles_per_sec = num_tiles / elapsed

    print(
        json.dumps(
            {
                "metric": "single-component particle updates/sec/chip "
                f"({'M71 quick config' if quick else 'M71 full-frame north star'}: "
                f"{num_tiles} tiles, "
                f"N={num_catalogs}/stratum, C={C}, {mh_steps} MH "
                f"sweeps/iter, {elapsed:.2f}s wall)",
                "value": updates_per_sec,
                "unit": "updates/sec",
                "vs_baseline": updates_per_sec / REFERENCE_UPDATES_PER_SEC,
                "tiles_per_sec_to_target_ess": tiles_per_sec,
                "min_final_ess_prop": min_final_ess_prop,
                "reference_tiles_per_sec": 1.0 / 40.0,  # 20-60 s/tile
            }
        )
    )


if __name__ == "__main__":
    main()
