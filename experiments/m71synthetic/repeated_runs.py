#!/usr/bin/env python
"""Monte-Carlo stability study: repeated CS-SMC runs on one image.

Mirrors the reference's repeated-runs experiment (manuscript.tex:574-597,
figs m71synthetic_repeatedruns): run CS-SMC ``--reps`` times independently
on a single synthetic image with a given true source count, for each
combination of the number of catalogs per stratum N (columns) and MH
mutation steps per SMC iteration (colors), and summarize the spread of
the per-stratum marginal log-likelihood estimates log p(x|s) and of the
posterior count probabilities p(s|x).

TPU-native design: the ``reps`` independent runs are one batched
``run_csmc`` call — the tile axis of the sampler carries the repetitions
(each tile gets its own PRNG stream), so a 100-run study is a single jit
instead of 100 sequential runs.

Outputs (under output/m71synthetic/):
- ``repeatedruns_s{count}.npz``: log p(x|s) [n_N, n_steps, reps, C] and
  count pmfs [n_N, n_steps, reps, C];
- ``repeatedruns_s{count}_summary.json``: middle-90% interval widths and
  the variance-shrinkage check;
- ``figures/repeatedruns_{logpx,countprob}_s{count}.png``.
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

COLORS = ["#2a78d6", "#eb6834", "#1baf7a"]


def run_grid(img, prior, model, kernel, base_cfg, Ns, steps_list, reps,
             seed=0, reps_per_call=None, verbose=True):
    import jax
    import jax.numpy as jnp

    from smcdet_tpu.inference.smc import run_csmc

    C = prior.num_counts
    logpx = np.zeros((len(Ns), len(steps_list), reps, C))
    pmf = np.zeros_like(logpx)
    iters = np.zeros((len(Ns), len(steps_list), reps))

    for a, N in enumerate(Ns):
        # Bound the per-call batch (reps x N particle rows per stratum):
        # the largest shapes crash the TPU compile helper (N=8192 fails
        # above ~16 tiles on v5e), and chunking the repetition axis costs
        # nothing statistically. Chunks are an even divisor of ``reps``
        # so every call shares one compiled shape.
        if reps_per_call is None:
            cap = max(1, 131072 // int(N))
            rpc = max(d for d in range(1, reps + 1)
                      if reps % d == 0 and d <= cap)
        else:
            rpc = reps_per_call
        for b, steps in enumerate(steps_list):
            smc_cfg = base_cfg.replace(num_catalogs=int(N))
            kern = kernel.replace(num_iters=int(steps))
            run = jax.jit(
                lambda key, imgs, kern=kern, smc_cfg=smc_cfg: run_csmc(
                    key, imgs, prior, model, kern, smc_cfg
                )
            )
            done = 0
            while done < reps:
                r = min(rpc, reps - done)
                key = jax.random.fold_in(
                    jax.random.key(seed), (a * 97 + b) * 1009 + done
                )
                batch = jnp.broadcast_to(img[None], (r,) + img.shape)
                res = jax.block_until_ready(run(key, batch))
                logpx[a, b, done : done + r] = np.asarray(
                    res.log_normalizing_constant
                )
                pmf[a, b, done : done + r] = np.asarray(
                    jax.nn.softmax(res.log_normalizing_constant, axis=-1)
                )
                iters[a, b, done : done + r] = float(res.num_iters)
                done += r
            if verbose:
                print(
                    f"N={N} steps={steps}: {reps} runs, "
                    f"smc_iters={iters[a, b].max():.0f}"
                )
    return logpx, pmf, iters


def interval_width(x, lo=0.05, hi=0.95, axis=-2):
    """Middle-90% spread across the repetition axis."""
    return np.quantile(x, hi, axis=axis) - np.quantile(x, lo, axis=axis)


def plot_grid(out_path, values, Ns, steps_list, strata, ylabel, title):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_cols = len(Ns)
    fig, axes = plt.subplots(
        1, n_cols, figsize=(3.9 * n_cols, 3.6), sharey=True
    )
    axes = np.atleast_1d(axes)
    offsets = np.linspace(-0.22, 0.22, len(steps_list))
    for a, (ax, N) in enumerate(zip(axes, Ns)):
        for b, steps in enumerate(steps_list):
            v = values[a, b][:, strata]  # [reps, len(strata)]
            med = np.median(v, axis=0)
            lo = np.quantile(v, 0.05, axis=0)
            hi = np.quantile(v, 0.95, axis=0)
            x = np.asarray(strata, dtype=float) + offsets[b]
            ax.errorbar(
                x, med, yerr=np.stack([med - lo, hi - med]),
                fmt="o", markersize=4.5, capsize=3, linewidth=1.6,
                color=COLORS[b % len(COLORS)], label=f"{steps} MH steps",
            )
        ax.set_title(f"N = {N}", fontsize=11)
        ax.set_xlabel("source count s")
        ax.set_xticks(list(strata))
        ax.spines[["top", "right"]].set_visible(False)
        ax.grid(True, axis="y", alpha=0.25, linewidth=0.6)
        ax.set_axisbelow(True)
    axes[0].set_ylabel(ylabel)
    axes[0].legend(frameon=False, fontsize=8, loc="best")
    fig.suptitle(title, fontsize=12)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--true-count", type=int, default=3)
    parser.add_argument("--reps", type=int, default=100)
    parser.add_argument("--num-catalogs", type=int, nargs="+",
                        default=[512, 2048, 8192])
    parser.add_argument("--mh-steps", type=int, nargs="+",
                        default=[10, 50, 100])
    parser.add_argument("--reps-per-call", type=int, default=None)
    args = parser.parse_args()

    import jax.numpy as jnp

    from smcdet_tpu.config import (
        build_image_model,
        build_kernel,
        build_prior,
    )
    from smcdet_tpu.inference.smc import SMCConfig

    cfg = experiment_config(Path(__file__))
    out_dir = Path(cfg.output_dir) / cfg.name
    tiles = np.load(out_dir / "tiles.npz")
    cand = np.flatnonzero(tiles["true_counts"] == args.true_count)
    # Prefer an image whose posterior count is genuinely uncertain (the
    # manuscript's repeated-runs image shows visible spread in p(s|x)):
    # rank candidates by posterior count entropy from the production run.
    idx = int(cand[0])
    try:
        from smcdet_tpu.runner import load_results

        smc = load_results(out_dir, "smc")
        ent = np.zeros(len(cand))
        for j, i in enumerate(cand):
            if i >= smc["pruned_counts"].shape[0]:
                continue
            w, c = smc["weights"][i], smc["pruned_counts"][i]
            pmf = np.bincount(c, weights=w, minlength=10)
            pmf = pmf / pmf.sum()
            ent[j] = -(pmf[pmf > 0] * np.log(pmf[pmf > 0])).sum()
        idx = int(cand[np.argmax(ent)])
        print(f"max posterior count entropy among candidates: {ent.max():.3f}")
    except FileNotFoundError:
        pass
    img = jnp.asarray(tiles["images"][idx], dtype=jnp.float32)
    print(f"image {idx}: true count {args.true_count}")

    prior = build_prior(cfg.prior)
    model = build_image_model(cfg.image_model)
    kernel = build_kernel(cfg.kernel)
    base_cfg = SMCConfig(
        num_catalogs=cfg.sampler.num_catalogs,
        ess_threshold_prop=cfg.sampler.ess_threshold_prop,
        resample_method=cfg.sampler.resample_method,
        max_smc_iters=cfg.sampler.max_smc_iters,
        flux_detection_threshold=cfg.sampler.flux_detection_threshold,
    )

    logpx, pmf, iters = run_grid(
        img, prior, model, kernel, base_cfg,
        args.num_catalogs, args.mh_steps, args.reps,
        reps_per_call=args.reps_per_call,
    )

    s = args.true_count
    np.savez_compressed(
        out_dir / f"repeatedruns_s{s}.npz",
        logpx=logpx, count_pmf=pmf, smc_iters=iters,
        num_catalogs=np.asarray(args.num_catalogs),
        mh_steps=np.asarray(args.mh_steps),
        image_index=idx,
    )

    # spread of log p(x|s) at the true count, per config
    w_logpx = interval_width(logpx)[..., s]  # [n_N, n_steps]
    w_pmf = interval_width(pmf)[..., s]
    summary = {
        "image_index": idx,
        "true_count": s,
        "num_catalogs": args.num_catalogs,
        "mh_steps": args.mh_steps,
        "logpx_mid90_width_at_true_count": np.round(w_logpx, 4).tolist(),
        "count_prob_mid90_width_at_true_count": np.round(w_pmf, 4).tolist(),
        # shrinkage: the best (largest N, most steps) config must be
        # tighter than the worst (smallest N, fewest steps) one; a width
        # that is already ~0 at the weakest config (degenerate posterior,
        # e.g. an unambiguous 1-star image) counts as trivially shrunk
        "shrinks_with_N_and_steps": bool(
            (w_logpx[-1, -1] < w_logpx[0, 0] or w_logpx[0, 0] <= 1e-4)
            and (w_pmf[-1, -1] < w_pmf[0, 0] or w_pmf[0, 0] <= 1e-4)
        ),
    }
    with open(out_dir / f"repeatedruns_s{s}_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))

    fig_dir = out_dir / "figures"
    fig_dir.mkdir(parents=True, exist_ok=True)
    C = logpx.shape[-1]
    strata = range(max(0, s - 1), min(C - 1, s + 3) + 1)
    plot_grid(
        fig_dir / f"repeatedruns_logpx_s{s}.png",
        logpx, args.num_catalogs, args.mh_steps, strata,
        ylabel=r"$\log \hat p(x\,|\,s)$",
        title=f"Marginal-likelihood variability over {args.reps} runs "
              f"(true count {s}; bars: middle 90%)",
    )
    plot_grid(
        fig_dir / f"repeatedruns_countprob_s{s}.png",
        pmf, args.num_catalogs, args.mh_steps, strata,
        ylabel=r"$\hat p(s\,|\,x)$",
        title=f"Posterior count-probability variability over {args.reps} "
              f"runs (true count {s}; bars: middle 90%)",
    )
    print(f"figures in {fig_dir}")


if __name__ == "__main__":
    main()
