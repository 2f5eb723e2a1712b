from smcdet_tpu.utils.units import (  # noqa: F401
    convert_mag_to_nmgy,
    convert_nmgy_to_mag,
)
from smcdet_tpu.utils.checkpoint import load_pytree, save_pytree  # noqa: F401
from smcdet_tpu.utils.devices import describe_devices, select_device  # noqa: F401
from smcdet_tpu.utils.diagnostics import (  # noqa: F401
    PhaseTimer,
    summarize_diagnostics,
    trace_profile,
)
