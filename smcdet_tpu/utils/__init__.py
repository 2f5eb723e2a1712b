from smcdet_tpu.utils.units import (  # noqa: F401
    convert_mag_to_nmgy,
    convert_nmgy_to_mag,
)
from smcdet_tpu.utils.devices import describe_devices, select_device  # noqa: F401
