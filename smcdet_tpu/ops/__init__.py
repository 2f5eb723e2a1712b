from smcdet_tpu.ops.assignment import (  # noqa: F401
    linear_sum_assignment,
    pad_cost_matrix,
)
from smcdet_tpu.ops.catalogs import (  # noqa: F401
    compact_catalog,
    prune_catalog,
    slot_mask,
)
from smcdet_tpu.ops.resampling import (  # noqa: F401
    gather_particles,
    multinomial_indices,
    resample_indices,
    systematic_indices,
)
from smcdet_tpu.ops.tempering import (  # noqa: F401
    ess_at_delta,
    solve_tempering_step,
)
