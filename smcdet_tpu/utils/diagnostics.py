"""Structured timing, profiling hooks, and run diagnostics.

The reference's observability is wall-clock prints around sampler calls
and `print_every` temperature/acceptance logs (SURVEY.md §5:
run_smc.py:137-158, sampler.py:233-242). Here:

- ``PhaseTimer`` collects named phase durations (with correct device-sync
  boundaries via ``block_until_ready``) and renders a table;
- ``trace_profile`` wraps ``jax.profiler.trace`` for XLA/TPU traces;
- ``summarize_diagnostics`` renders the per-iteration history that
  ``run_csmc`` records when ``SMCConfig.record_history`` is on
  (temperature / per-stratum ESS / acceptance trajectories — the
  quantities the reference only prints transiently).
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict

import jax
import numpy as np

__all__ = ["PhaseTimer", "trace_profile", "summarize_diagnostics"]


class PhaseTimer:
    """Accumulates wall-clock per named phase.

    >>> timer = PhaseTimer()
    >>> with timer("sampling"):
    ...     result = run(...)            # doctest: +SKIP
    >>> print(timer.report())            # doctest: +SKIP
    """

    def __init__(self):
        self.totals: "OrderedDict[str, float]" = OrderedDict()
        self.counts: "OrderedDict[str, int]" = OrderedDict()

    @contextlib.contextmanager
    def __call__(self, name: str, sync=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [f"{'phase':<24}{'total s':>10}{'calls':>8}{'share':>8}"]
        for name, t in self.totals.items():
            lines.append(
                f"{name:<24}{t:>10.3f}{self.counts[name]:>8}"
                f"{t / total:>8.1%}"
            )
        return "\n".join(lines)

    def as_dict(self):
        return dict(self.totals)


@contextlib.contextmanager
def trace_profile(log_dir: str):
    """Capture an XLA/TPU profiler trace viewable with xprof/tensorboard."""
    with jax.profiler.trace(log_dir):
        yield


def summarize_diagnostics(result) -> str:
    """Human-readable summary of an ``SMCResult`` with recorded history."""
    lines = []
    n = int(result.num_iters)
    lines.append(
        f"SMC finished in {n} iterations; final temperature range "
        f"[{float(np.min(result.temperature)):.3f}, "
        f"{float(np.max(result.temperature)):.3f}]"
    )
    ess = np.asarray(result.ess)
    lines.append(
        f"final per-stratum ESS: min {ess.min():.1f}, "
        f"median {np.median(ess):.1f}"
    )
    acc = np.asarray(result.acc_rate)
    lines.append(
        f"final acceptance rate: min {acc.min():.3f}, max {acc.max():.3f}"
    )
    hist = getattr(result, "history", None)
    if hist is not None:
        temp = np.asarray(hist["temperature"])[:n]
        acc_h = np.asarray(hist["acc_rate"])[:n]
        for i in range(n):
            lines.append(
                f"  iter {i + 1:3d}: temperature "
                f"[{temp[i].min():.3f}, {temp[i].max():.3f}] "
                f"acc [{acc_h[i].min():.2f}, {acc_h[i].max():.2f}]"
            )
    return "\n".join(lines)
