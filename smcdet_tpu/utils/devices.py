"""Device discovery helpers.

The reference picks the CUDA device with the most free memory by parsing
``nvidia-smi`` (/root/reference/utils/misc.py:4-24). Under JAX's
single-controller model device placement is explicit, so the equivalents
here are simple introspection utilities used by experiment drivers and
logging.
"""

from __future__ import annotations

import jax

__all__ = ["select_device", "describe_devices"]


def select_device(platform: str | None = None):
    """First device of ``platform`` (e.g. "tpu", "cpu"); default backend
    otherwise. Raises if the requested platform has no devices."""
    devices = jax.devices(platform) if platform else jax.devices()
    if not devices:
        raise RuntimeError(f"no devices for platform {platform!r}")
    return devices[0]


def describe_devices():
    """One-line-per-device summary (kind, id, process, memory stats when
    the backend exposes them)."""
    lines = []
    for d in jax.devices():
        mem = ""
        stats = getattr(d, "memory_stats", None)
        if callable(stats):
            try:
                s = stats() or {}
                if "bytes_in_use" in s and "bytes_limit" in s:
                    used = s["bytes_in_use"] / 2**30
                    lim = s["bytes_limit"] / 2**30
                    mem = f" mem {used:.2f}/{lim:.2f} GiB"
            except Exception:
                pass
        lines.append(
            f"{d.device_kind} id={d.id} process={d.process_index}{mem}"
        )
    return "\n".join(lines)
