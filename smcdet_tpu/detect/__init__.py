from smcdet_tpu.detect.extractor import (  # noqa: F401
    estimate_background,
    extract,
    extract_batch,
    tune_extractor,
)
