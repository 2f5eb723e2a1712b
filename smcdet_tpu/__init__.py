"""smcdet_tpu — TPU-native sequential-Monte-Carlo object detection.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``timwhite0/smcdet`` (count-stratified SMC samplers for probabilistic star
detection/deblending), built TPU-first: dense gather/scatter-free PSF
rendering, on-device adaptive tempering, `lax.scan` mutation sweeps with
incremental likelihood caching, and tile parallelism over a
``jax.sharding.Mesh``.
"""

import os as _os

import jax as _jax

# Honor an explicit JAX_PLATFORMS env var. The axon TPU plugin clobbers it
# at import time by setting the config to "axon,cpu"; without this shim
# "JAX_PLATFORMS=cpu" silently runs everything over the device tunnel,
# where each eagerly dispatched trace-time constant costs ~1s. Only act
# while the config still holds the plugin's default so explicit
# jax.config.update() calls (e.g. the test conftest) always win.
_env_platforms = _os.environ.get("JAX_PLATFORMS")
if (
    _env_platforms
    and _env_platforms != "axon"
    and _jax.config.jax_platforms == "axon,cpu"
):
    try:
        _jax.config.update("jax_platforms", _env_platforms)
    except Exception:  # pragma: no cover - plugin-dependent
        pass

from smcdet_tpu import (  # noqa: F401
    config,
    detect,
    distributions,
    inference,
    ingest,
    metrics,
    models,
    ops,
    parallel,
    utils,
    validation,
)

__version__ = "0.1.0"
