"""Tile parallelism over a ``jax.sharding.Mesh``.

The reference's only parallelism is single-GPU tensor batching plus manual
multi-process sharding via a ``BATCH_INDEX`` env var
(/root/reference/experiments/m71/run_mcmc.py:84). Here tile parallelism is
first-class: per-tile CS-SMC is embarrassingly parallel, so the tile axis
shards across the mesh with zero communication inside the SMC loop (the only
cross-tile collective is the scalar ``any(temperature < 1)`` loop condition,
which XLA lowers to a cheap ``psum`` over ICI).
"""

from smcdet_tpu.parallel.sharding import (  # noqa: F401
    shard_tiles_jit,
    tile_mesh,
    tile_sharding,
)
