"""Mesh construction + tile-sharded execution of the samplers.

TPU-native replacement for the reference's manual job sharding
(/root/reference/experiments/m71/run_mcmc.py:84-89): instead of one process
per GPU with an env-var batch index, the tile axis of every particle array
(``[T, ...]``) is sharded over a 1-D device mesh and the whole SMC loop runs
as one SPMD program. XLA's sharding propagation carries the tile sharding
from the input images through every downstream array (particles, weights,
temperatures), so no per-array annotations are needed beyond the inputs.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tile_mesh", "tile_sharding", "shard_tiles_jit"]

TILE_AXIS = "tiles"


def tile_mesh(devices=None, axis_name: str = TILE_AXIS) -> Mesh:
    """1-D mesh over ``devices`` (default: all local devices)."""
    if isinstance(devices, Mesh):
        return devices
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def tile_sharding(mesh: Mesh, axis_name: str = TILE_AXIS) -> NamedSharding:
    """Sharding that splits array axis 0 (the tile axis) over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_tiles_jit(fn, devices=None, axis_name: str = TILE_AXIS):
    """Wrap ``fn(key, images, *rest)`` so the tile axis of ``images`` (and
    everything derived from it) shards over the mesh.

    ``rest`` (prior/model/kernel/config pytrees) is replicated. The number
    of tiles must be divisible by the mesh size.
    """
    mesh = tile_mesh(devices, axis_name)
    tiles = tile_sharding(mesh, axis_name)
    jitted = jax.jit(fn)

    def wrapped(key, images, *rest):
        n = mesh.devices.size
        if images.shape[0] % n:
            raise ValueError(
                f"number of tiles {images.shape[0]} must be divisible by "
                f"mesh size {n}"
            )
        # The committed input sharding seeds XLA's sharding propagation;
        # every array derived from `images` (particles, weights, rates)
        # inherits the tile split.
        images = jax.device_put(images, tiles)
        return jitted(key, images, *rest)

    return wrapped
