"""Two-process smoke test of the multi-host job-parallel path.

The reference shards long runs across processes by hand with a
BATCH_INDEX env var (run_mcmc.py:84-89); parallel/distributed.py makes
that first-class on jax.distributed. This test launches two real
processes on CPU, bootstraps the process group over a localhost
coordinator, and checks that the batch runner automatically splits the
experiment's batches disjointly between them.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = str(Path(__file__).resolve().parents[1])

CHILD = """
import os, sys
sys.path.insert(0, os.environ["SMCDET_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from smcdet_tpu.parallel.distributed import (
    host_shard,
    initialize_distributed,
    is_distributed,
)

assert initialize_distributed(), "expected a multi-process group"
assert is_distributed()
assert jax.process_count() == 2
job, njobs = host_shard()
assert njobs == 2 and job == jax.process_index()

from smcdet_tpu.config import ExperimentConfig
from smcdet_tpu.runner import run_experiment

cfg = ExperimentConfig(
    name="dist_smoke",
    seed=0,
    num_images=2,
    batch_size=1,
    output_dir=os.environ["SMCDET_OUT"],
)
cfg.prior.family = "star"
cfg.prior.max_objects = 2
cfg.prior.min_objects = 0
cfg.prior.flux_mean = 200.0
cfg.prior.flux_stdev = 25.0
cfg.prior.pad = 1.0
cfg.image_model.kind = "gaussian"
cfg.image_model.background = 100.0
cfg.image_model.psf_radius = 4
cfg.kernel.kind = "mh"
cfg.kernel.num_iters = 2
cfg.kernel.fluxes_min = 1.0
cfg.kernel.fluxes_max = 1000.0
cfg.sampler.num_catalogs = 16
cfg.sampler.max_smc_iters = 2
cfg.aggregation.enabled = False

# no explicit job args: the runner derives the shard from the process group
out = run_experiment(cfg, method="smc", verbose=False)
print(f"DONE process {jax.process_index()} -> {out}", flush=True)
"""


def test_two_process_job_sharding(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            SMCDET_REPO=REPO,
            SMCDET_OUT=str(tmp_path),
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"DONE process {pid}" in out

    out_dir = tmp_path / "dist_smoke"
    batches = sorted(out_dir.glob("smc_batch*.npz"))
    # 2 images x batch_size 1 = 2 batches, one written by each process
    assert [b.name for b in batches] == ["smc_batch0000.npz", "smc_batch0001.npz"]
    for b in batches:
        arrs = np.load(b)
        assert np.isfinite(arrs["log_normalizing_constant"]).all()
    # disjoint shards: each process's manifest lists exactly one batch
    import json

    for j in range(2):
        with open(out_dir / f"smc_manifest_job{j}.json") as f:
            manifest = json.load(f)
        assert [b["batch"] for b in manifest["batches"]] == [j]
