"""Multi-host (multi-process) job parallelism.

The reference shards long experiment runs across processes by hand with a
``BATCH_INDEX`` environment variable per process
(/root/reference/experiments/m71/run_mcmc.py:84-89). Here the same
image-granularity job parallelism is first-class on top of
``jax.distributed``: one controller process per host, the process group
bootstrapped once, and the batch runner deriving its shard from
``jax.process_index()`` / ``jax.process_count()``.

Topology doctrine (SURVEY §2 parallelism table): tiles/particles shard
over ICI *within* a host's chips (parallel/sharding.py); independent
images/fields shard over DCN *across* hosts — no cross-host communication
inside a sampler, so DCN bandwidth never touches the hot path.
"""

from __future__ import annotations

import os

import jax

__all__ = [
    "initialize_distributed",
    "is_distributed",
    "host_shard",
]

_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
    require: bool = False,
) -> bool:
    """Bootstrap the JAX process group (idempotent).

    Must run before anything initializes the XLA backend (JAX refuses
    otherwise) — the CLI drivers call this before importing the runner.

    Arguments fall back to the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``). With neither arguments nor env vars:

    - ``require=False`` (library default): single-process no-op, returns
      False — single-host runs need no special-casing at call sites;
    - ``require=True`` (the ``--distributed`` CLI contract): attempt the
      bare ``jax.distributed.initialize()``, which auto-detects the
      cluster on TPU pods / managed environments and raises where it
      cannot — never silently falls back to every process running the
      full unsharded job against the same output paths.

    Returns True when a multi-process group was initialized.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        if not require:
            # single-process run: nothing to bootstrap
            return False
        jax.distributed.initialize()  # cluster auto-detection, or raise
        _initialized = True
        return jax.process_count() > 1

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return jax.process_count() > 1


def is_distributed() -> bool:
    return jax.process_count() > 1


def host_shard(job_index: int = 0, num_jobs: int = 1) -> tuple[int, int]:
    """Resolve the (job_index, num_jobs) shard for this process.

    Explicit CLI sharding wins (the reference's BATCH_INDEX semantics);
    otherwise, in a multi-process run each process takes its
    ``process_index``-th shard automatically.
    """
    if num_jobs != 1:
        return job_index, num_jobs
    if jax.process_count() > 1:
        return jax.process_index(), jax.process_count()
    return job_index, num_jobs
