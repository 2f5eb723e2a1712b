#!/usr/bin/env python
"""Truth-referenced scoring of D&C vs single-tile (VERDICT r4 task 3).

The bridge-effort ladder showed the pooled cross-pipeline TVD is flat in
bridge effort, and the per-image attribution shows the excess
concentrates on crowded images where the two pipelines disagree in a
*consistent direction*. That raises the possibility that the suite's
"gold standard" — one whole-image CS-SMC run per rep
(config_singletile.yaml) — is itself the biased arm on crowded images:
its count posterior comes from per-stratum logZ estimates over a 16x16
region where each stratum's particle cloud must cover a much larger
configuration space than the 8x8-tile runs feeding the D&C tree.

This script breaks the tie by scoring BOTH pipelines against the
simulator truth counts (not against each other), from the per-rep pmf
dump of ``compare_pooled.py --dump``:

- ``log_score``: mean over images of log(pooled pmf at the true count)
  (clipped at 1e-3) — the proper-scoring-rule comparison;
- ``pmf_at_truth``: mean pooled posterior mass on the true count;
- ``mode_hit``: fraction of images whose pooled pmf mode is the truth;
- ``signed_bias``: mean (posterior-mean count - truth);
- paired per-image log-score differences (D&C - single-tile) with a
  bootstrap CI over images and a sign count.

Caveat (stated, not hidden): an exact posterior need not put its mode
at the simulated truth on any one image, so single-image disagreement
with truth is not bias. But both pipelines target the SAME posterior;
averaged over 30+ images, the arm that systematically scores worse at
truth — and in a consistent direction (e.g. overcounting) — is the one
that has drifted from that shared target. Reference semantics under
test: /root/reference/smcdet/aggregate.py:523-593.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def scores(pool, truth, ks):
    """pool: [I, K] pooled pmfs; truth: [I]."""
    I = pool.shape[0]
    at_truth = pool[np.arange(I), truth]
    mean_count = (pool * ks).sum(-1)
    return {
        "log_score": float(np.log(np.clip(at_truth, 1e-3, None)).mean()),
        "pmf_at_truth": float(at_truth.mean()),
        "mode_hit": float((pool.argmax(-1) == truth).mean()),
        "signed_bias": float((mean_count - truth).mean()),
        "abs_err_mean_count": float(np.abs(mean_count - truth).mean()),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--suffix", type=str, default="_dump")
    parser.add_argument("--boot", type=int, default=20_000)
    parser.add_argument("--hard-top", type=int, default=5,
                        help="size of the 'hardest images' subset "
                        "(by cross-pipeline pooled TVD)")
    args = parser.parse_args()

    out_dir = Path("output/divideandconquer")
    d = np.load(out_dir / f"pooled_pmfs{args.suffix}.npz")
    st, dc = d["st_pmfs"], d["dc_pmfs"]  # [R, I, K]
    truth = d["true_counts"].astype(int)
    R, I, K = st.shape
    ks = np.arange(K)

    st_pool, dc_pool = st.mean(0), dc.mean(0)
    tvd = 0.5 * np.abs(st_pool - dc_pool).sum(-1)
    hard = np.argsort(-tvd)[: args.hard_top]

    # paired per-image log-score difference, bootstrap over images
    ls_st = np.log(np.clip(st_pool[np.arange(I), truth], 1e-3, None))
    ls_dc = np.log(np.clip(dc_pool[np.arange(I), truth], 1e-3, None))
    diff = ls_dc - ls_st
    rng = np.random.default_rng(0)
    idx = rng.integers(0, I, size=(args.boot, I))
    boot = diff[idx].mean(-1)
    lo, hi = np.percentile(boot, [2.5, 97.5])

    report = {
        "images": int(I),
        "reps": int(R),
        "singletile": scores(st_pool, truth, ks),
        "dc": scores(dc_pool, truth, ks),
        "singletile_hard": scores(st_pool[hard], truth[hard], ks),
        "dc_hard": scores(dc_pool[hard], truth[hard], ks),
        "hard_images": [int(i) for i in hard],
        "paired_log_score_diff_dc_minus_single": {
            "mean": round(float(diff.mean()), 3),
            "ci95": [round(float(lo), 3), round(float(hi), 3)],
            "dc_better_count": int((diff > 0).sum()),
            "single_better_count": int((diff < 0).sum()),
            "tied": int((diff == 0).sum()),
        },
        # per-rep (unpooled) mode-hit: does a SINGLE run of each arm
        # find the truth? (uses all R reps as extra resolution)
        "per_rep_mode_hit": {
            "singletile": float(
                (st.argmax(-1) == truth[None, :]).mean()
            ),
            "dc": float((dc.argmax(-1) == truth[None, :]).mean()),
        },
    }
    name = f"truth_score{args.suffix}.json"
    with open(out_dir / name, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
