"""Survey data ingestion (layer L5).

TPU-native, dependency-light replacement for the reference's SDSS pipeline
(/root/reference/experiments/m71/survey_utils/): where the reference leans
on astropy/galsim/reproject, this package implements the needed slices
directly — a pure-numpy FITS reader/writer, TAN-projection WCS math,
bicubic band alignment, and direct PSF-profile evaluation — so the
ingestion layer runs anywhere JAX does.
"""

from smcdet_tpu.ingest import fits  # noqa: F401
from smcdet_tpu.ingest.align import align  # noqa: F401
from smcdet_tpu.ingest.catalogs import (  # noqa: F401
    FullCatalog,
    SourceType,
    TileCatalog,
)
from smcdet_tpu.ingest.psf import ImagePSF, PSFConfig, render_psf_image  # noqa: F401
from smcdet_tpu.ingest.sdss import (  # noqa: F401
    PhotoFullCatalog,
    SDSSDownloader,
    SloanDigitalSkySurvey,
    read_frame,
    read_psf_params,
)
from smcdet_tpu.ingest.survey import Survey, SurveyPredictIterator  # noqa: F401
from smcdet_tpu.ingest.wcs import TanWCS  # noqa: F401
