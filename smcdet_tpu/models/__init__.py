from smcdet_tpu.models.imaging import ImageModel, M71ImageModel  # noqa: F401
from smcdet_tpu.models.priors import (  # noqa: F401
    GeometricProcessPrior,
    M71Prior,
    ParetoStarPrior,
    PointProcessPrior,
    PoissonProcessPrior,
    StarPrior,
)
from smcdet_tpu.models.psf import GaussianPSF, SDSSPSF  # noqa: F401
from smcdet_tpu.models.simulate import generate_images  # noqa: F401
