"""Optional harness for numerical-parity tests against the reference repo.

The reference implementation (PyTorch, mounted read-only at
/root/reference) is imported *as a test oracle only* — our implementation
never depends on it. Tests using this harness are skipped automatically when
the reference or torch is unavailable.
"""

import sys

import pytest

REFERENCE_PATH = "/root/reference"


def load_reference():
    try:
        import torch  # noqa: F401
    except Exception:  # pragma: no cover
        pytest.skip("torch not available for reference parity tests")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import smcdet  # noqa: F401
    except Exception:  # pragma: no cover
        pytest.skip("reference repo not importable")
    import smcdet.distributions
    import smcdet.images
    import smcdet.prior

    return smcdet
