#!/usr/bin/env python
"""Bright-star split-mode study: does split/merge cure the trap?

The MCMC-anchor study (docs/results/RESULTS.md) found the stable failure
mode of both MCMC baselines on the brightest single-star m71synthetic
image (~727 nmgy): the saturated single-site MH sampler (the reference's
own design, /root/reference/experiments/m71/run_mcmc.py:72-125) latches
several slots onto the one bright star and cannot leave, and the plain
birth/death RJ chain is equally stuck because a death of one split
partner leaves its share of the flux unexplained. The coordinated
split/merge moves (inference/transdimensional.py, the merge direction
transfers the dead partner's flux to the survivor in the same move) are
the documented cure.

This script runs the three anchors on that image — saturated single-site
MH, plain birth/death RJ, and birth/death + split/merge RJ — with
``--chains`` independent chains each, and reports the pooled pruned-count
posterior, the per-chain modal count, and the fraction of chains stuck
above the true count. Outputs ``split_mode_study.json`` +
``figures/split_mode_study.png`` under output/m71synthetic/.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from common import experiment_config

COLORS = {"mh": "#6b6b66", "rj": "#2a78d6", "rj_splitmerge": "#eb6834"}
LABELS = {
    "mh": "saturated single-site MH",
    "rj": "RJ birth/death",
    "rj_splitmerge": "RJ birth/death + split/merge",
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--chains", type=int, default=64)
    parser.add_argument("--num-samples", type=int, default=20_000)
    parser.add_argument("--burnin", type=int, default=10_000)
    parser.add_argument("--thin", type=int, default=2)
    parser.add_argument("--prob-split", type=float, default=0.15)
    parser.add_argument("--prob-merge", type=float, default=0.15)
    parser.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (the axon TPU plugin overrides "
        "JAX_PLATFORMS, so an env var alone cannot)",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from smcdet_tpu.config import build_image_model, build_kernel, build_prior
    from smcdet_tpu.inference.mcmc import MCMCConfig, run_mh, run_rjmh
    from smcdet_tpu.inference.transdimensional import BirthDeathMH

    cfg = experiment_config(Path(__file__))
    out_dir = Path(cfg.output_dir) / cfg.name
    tiles = np.load(out_dir / "tiles.npz")

    # the brightest single-star image (the RESULTS.md 727-nmgy case)
    single = np.flatnonzero(tiles["true_counts"] == 1)
    bright = tiles["true_fluxes"][single].max(-1)
    idx = int(single[np.argmax(bright)])
    true_flux = float(bright.max())
    image = jnp.asarray(tiles["images"][idx], dtype=jnp.float32)
    # one chain per "tile": replicate the image across the batch axis
    images = jnp.broadcast_to(image, (args.chains,) + image.shape)

    prior = build_prior(cfg.prior)
    model = build_image_model(cfg.image_model)
    kernel = build_kernel(cfg.kernel).replace(
        num_iters=1,
        locs_stdev=jnp.float32(cfg.mcmc.locs_stdev),
        fluxes_stdev=jnp.float32(cfg.mcmc.fluxes_stdev),
    )
    mc_cfg = MCMCConfig(
        num_samples_total=args.num_samples,
        num_samples_burnin=args.burnin,
        keep_every_k=args.thin,
        flux_detection_threshold=cfg.sampler.flux_detection_threshold,
    )
    anchors = {
        "mh": lambda k: run_mh(k, images, prior, model, kernel, mc_cfg),
        "rj": lambda k: run_rjmh(
            k,
            images,
            prior,
            model,
            BirthDeathMH(num_iters=1, move=kernel),
            mc_cfg,
        ),
        "rj_splitmerge": lambda k: run_rjmh(
            k,
            images,
            prior,
            model,
            BirthDeathMH(
                num_iters=1,
                move=kernel,
                prob_split=args.prob_split,
                prob_merge=args.prob_merge,
            ),
            mc_cfg,
        ),
    }

    K = prior.max_objects + 2
    report = {
        "image_index": idx,
        "true_count": 1,
        "true_flux_nmgy": round(true_flux, 2),
        "chains": args.chains,
        "samples": args.num_samples,
        "burnin": args.burnin,
        "anchors": {},
    }
    pmfs = {}
    for a_idx, (name, runner) in enumerate(anchors.items()):
        print(f"running {name} ({args.chains} chains x {args.num_samples})")
        # fixed per-anchor seeds: Python's str hash is salted per process,
        # which would make the committed study non-reproducible
        res = jax.block_until_ready(
            jax.jit(runner)(jax.random.key(1000 + a_idx))
        )
        counts = np.asarray(res.pruned_counts)  # [chains, kept]
        pooled = np.bincount(counts.ravel(), minlength=K)[:K]
        pooled = pooled / pooled.sum()
        modal = np.array(
            [np.bincount(c, minlength=K).argmax() for c in counts]
        )
        pmfs[name] = pooled
        report["anchors"][name] = {
            "pooled_count_pmf": [round(float(p), 4) for p in pooled],
            "pooled_mean_count": round(float((pooled * np.arange(K)).sum()), 3),
            "chains_modal_at_true": int((modal == 1).sum()),
            "chains_stuck_above": int((modal > 1).sum()),
            "acc_rate_mean": round(float(np.asarray(res.acc_rate).mean()), 3),
        }
        print(json.dumps(report["anchors"][name], indent=2))

    with open(out_dir / "split_mode_study.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.2, 4.2))
    width = 0.27
    ks = np.arange(K)
    for i, (name, pmf) in enumerate(pmfs.items()):
        ax.bar(ks + (i - 1) * width, pmf, width, color=COLORS[name],
               label=LABELS[name], edgecolor="white", linewidth=0.5)
    ax.axvline(1.0, color="black", linestyle="dotted", linewidth=1,
               label="true count")
    ax.set_xlabel("pruned star count")
    ax.set_ylabel("pooled posterior probability")
    ax.set_title(
        f"split-mode study: image {idx} ({true_flux:.0f} nmgy single star), "
        f"{args.chains} chains each",
        fontsize=11,
    )
    ax.legend(frameon=False, fontsize=9)
    ax.spines[["top", "right"]].set_visible(False)
    fig.tight_layout()
    fig_dir = out_dir / "figures"
    fig_dir.mkdir(parents=True, exist_ok=True)
    fig.savefig(fig_dir / "split_mode_study.png", dpi=150)
    print(f"figure: {fig_dir / 'split_mode_study.png'}")


if __name__ == "__main__":
    main()
