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

# Submodules load lazily (PEP 562). Besides import latency, this matters
# for multi-host bootstrap: jax.distributed.initialize() must run before
# anything touches the XLA backend, and several submodules materialise
# jnp constants at import time — an eager package import would initialise
# the backend before parallel.distributed could be reached.
import importlib as _importlib

_SUBMODULES = (
    "config",
    "detect",
    "distributions",
    "fitting",
    "inference",
    "ingest",
    "metrics",
    "models",
    "ops",
    "parallel",
    "runner",
    "utils",
    "validation",
)


def __getattr__(name):
    if name in _SUBMODULES:
        mod = _importlib.import_module(f"smcdet_tpu.{name}")
        globals()[name] = mod
        return mod
    raise AttributeError(f"module 'smcdet_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_SUBMODULES))


__version__ = "0.1.0"
