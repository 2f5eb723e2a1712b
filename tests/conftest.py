"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(``--xla_force_host_platform_device_count=8``); the real TPU chip is only
used by bench.py / the driver, never by unit tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The env var alone is not enough on this image: the TPU platform plugin
# overrides JAX_PLATFORMS at import time, silently moving "CPU" tests onto
# the real chip (and its tunnel latency). The config update wins.
# SMCDET_TEST_TPU=1 opts into running on the real chip (tests/test_pallas.py
# needs it — Mosaic kernels cannot lower on the CPU mesh).
if os.environ.get("SMCDET_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
