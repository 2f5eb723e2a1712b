"""smcdet_tpu — TPU-native sequential-Monte-Carlo object detection.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``timwhite0/smcdet`` (count-stratified SMC samplers for probabilistic star
detection/deblending), built TPU-first: dense gather/scatter-free PSF
rendering, on-device adaptive tempering, `lax.scan` mutation sweeps with
incremental likelihood caching, and tile parallelism over a
``jax.sharding.Mesh``.
"""

from smcdet_tpu import distributions, metrics, models, ops, utils  # noqa: F401

__version__ = "0.1.0"
