"""Diagnose the on-chip gaussian MH equilibrium gap (round-4 queue,
tests/test_pallas.py::TestFusedSweepOnTPU::test_matches_xla_equilibrium).

Observed on TPU: after 40 sweeps the fused Pallas chain's tempered-target
q25 is -3837 vs the XLA oracle's -4169 (gap 332 nats); q50/q75 unchecked
(assert fired at q25). Poisson MH and gaussian MALA pass. Two hypotheses:

H1 (warm-up): both chains are exact but mix at different speeds; 40
    sweeps is mid-warm-up, where quantiles reflect trajectory, not
    target.  Prediction: the XLA chain's own q25 keeps rising well past
    40 sweeps, and backends agree at equilibrium (e.g. 600+ sweeps).
H2 (bias): the Pallas gaussian-MH path has a defect (proposal-mass
    correction, flux-prior delta, gaussian ll delta).  Prediction: the
    gap persists at equilibrium.

This script runs the exact failing test configuration for an iteration
ladder x both backends x several seeds and prints the quantile
trajectories.  On CPU only the XLA arm runs (the fused kernel needs
Mosaic); on TPU both run.  The XLA path's PRNG is threefry, so its CPU
trajectory is the TPU trajectory.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def setup(noise="gaussian"):
    from smcdet_tpu.inference.kernels import SingleComponentMH, TargetContext
    from smcdet_tpu.models.imaging import ImageModel, M71ImageModel
    from smcdet_tpu.models.priors import (
        M71Prior,
        NormalFlux,
        PointProcessPrior,
        UniformCounts,
    )
    from smcdet_tpu.models.psf import GaussianPSF

    if noise == "gaussian":
        prior = M71Prior(
            min_objects=0, max_objects=4, counts_rate=0.03,
            image_height=8, image_width=8, flux_alpha=0.214,
            flux_lower=0.252, flux_upper=1804.679, pad=1.0,
        )
        model = M71ImageModel(
            image_height=8, image_width=8, background=865.0,
            adu_per_nmgy=856.0,
            psf_params=(1.51, 4.85, 1.32, 3.0, 0.09, 0.002),
            psf_radius=8, noise_multiplicative=1.94,
        )
        kw = dict(fluxes_min=jnp.float32(0.252),
                  fluxes_max=jnp.float32(1804.679),
                  fluxes_stdev=jnp.float32(5.0))
    else:
        prior = PointProcessPrior(
            min_objects=0, max_objects=4, image_height=8, image_width=8,
            pad=1.0, counts=UniformCounts(0, 4),
            flux=NormalFlux(mean=jnp.float32(2000.0),
                            stdev=jnp.float32(300.0)),
        )
        model = ImageModel(
            height=8, width=8, psf_radius=4, noise="poisson",
            background=jnp.float32(100.0),
            psf=GaussianPSF(stdev=jnp.float32(1.0)),
        )
        kw = dict(fluxes_min=jnp.float32(500.0),
                  fluxes_max=jnp.float32(5000.0),
                  fluxes_stdev=jnp.float32(60.0))

    T, C, N = 2, 5, 256
    key = jax.random.key(0)
    strata, locs, fluxes = prior.sample_stratified(key, N, (T,))
    counts = jnp.broadcast_to(strata[None, :, None], (T, C, N))
    images = jnp.abs(
        model.sample(jax.random.key(1), locs[:, -1, 0], fluxes[:, -1, 0])
    )
    ctx = TargetContext(
        prior=prior, model=model, image=images[:, None, None],
        temperature=jnp.full((T, 1, 1), 0.8),
    )
    return kw, prior, model, ctx, counts, locs, fluxes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--noise", default="gaussian")
    ap.add_argument("--iters", type=int, nargs="+",
                    default=[40, 100, 200, 400, 800, 1600])
    ap.add_argument("--seeds", type=int, nargs="+", default=[5, 6, 7])
    ap.add_argument("--backends", nargs="+", default=None)
    args = ap.parse_args()

    from smcdet_tpu.inference.kernels import SingleComponentMH

    on_tpu = jax.devices()[0].platform == "tpu"
    backends = args.backends or (["xla", "pallas"] if on_tpu else ["xla"])
    kw, prior, model, ctx, counts, locs, fluxes = setup(args.noise)

    rows = []
    for backend in backends:
        for ni in args.iters:
            kern = SingleComponentMH(
                num_iters=ni, locs_stdev=jnp.float32(0.25),
                backend=backend, **kw,
            )
            run = jax.jit(lambda k, l, f, kn=kern: kn.run(k, ctx, counts, l, f))
            for seed in args.seeds:
                st, acc = run(jax.random.key(seed), locs, fluxes)
                lt = np.asarray(
                    st.logprior + 0.8 * st.parent_ll
                ).ravel()
                q = {
                    f"q{p}": float(np.percentile(lt, p))
                    for p in (10, 25, 50, 75, 90)
                }
                row = dict(
                    backend=backend, iters=ni, seed=seed,
                    acc=float(np.mean(np.asarray(acc))), **q,
                )
                # cache consistency of the final state (bias detector
                # independent of mixing): recomputed vs cached
                pll = model.loglikelihood(ctx.image, st.locs, st.fluxes)
                drift = np.abs(np.asarray(pll - st.parent_ll))
                scale = np.maximum(np.abs(np.asarray(pll)), 1.0)
                row["ll_drift"] = float((drift / scale).max())
                lp = prior.log_prob(counts, st.locs, st.fluxes)
                row["lp_drift"] = float(
                    np.abs(np.asarray(lp - st.logprior)).max()
                )
                rows.append(row)
                print(json.dumps(row), flush=True)

    # summary: per backend, the largest-iters mean quantiles
    top = max(args.iters)
    for backend in backends:
        sel = [r for r in rows if r["backend"] == backend
               and r["iters"] == top]
        if sel:
            print(
                f"# {backend} @ {top} iters: "
                f"q25={np.mean([r['q25'] for r in sel]):.1f} "
                f"q50={np.mean([r['q50'] for r in sel]):.1f} "
                f"q75={np.mean([r['q75'] for r in sel]):.1f} "
                f"acc={np.mean([r['acc'] for r in sel]):.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
