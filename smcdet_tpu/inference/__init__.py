from smcdet_tpu.inference.aggregate import (  # noqa: F401
    Aggregate,
    AggregateConfig,
)
from smcdet_tpu.inference.kernels import (  # noqa: F401
    SingleComponentMALA,
    SingleComponentMH,
    TargetContext,
)
from smcdet_tpu.inference.mcmc import (  # noqa: F401
    MCMCConfig,
    MCMCResult,
    MHSampler,
    MHsampler,
    run_mh,
)
from smcdet_tpu.inference.transdimensional import (  # noqa: F401
    BirthDeathMH,
    TDSMCConfig,
    TDSMCResult,
    run_tdsmc,
)
from smcdet_tpu.inference.smc import (  # noqa: F401
    SMCConfig,
    SMCResult,
    SMCSampler,
    SMCsampler,
    run_csmc,
    tile_image,
)
from smcdet_tpu.inference.streaming import (  # noqa: F401
    run_csmc_streaming,
)
