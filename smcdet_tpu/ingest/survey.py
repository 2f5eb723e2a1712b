"""Survey abstraction + prediction iterator.

Plain-python re-design of
/root/reference/experiments/m71/survey_utils/survey.py:10-113 (which
subclasses ``pytorch_lightning.LightningDataModule``): the same contract —
``prepare_data`` / ``__getitem__`` / ``image_ids`` — without the Lightning
dependency, plus ``SurveyPredictIterator`` performing background
subtraction, flux calibration, optional band alignment, band/hw cropping,
and the crop-to-multiple-of-16 (survey.py:59-107).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

from smcdet_tpu.ingest.align import align

__all__ = ["Survey", "SurveyPredictIterator"]


class Survey(ABC):
    BANDS = ()

    align_to_band = None
    crop_to_hw = None
    crop_to_bands = None

    @abstractmethod
    def prepare_data(self):
        """Download/stage everything __getitem__ needs."""

    @abstractmethod
    def __len__(self):
        ...

    @abstractmethod
    def __getitem__(self, idx):
        ...

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    @abstractmethod
    def image_id(self, idx: int):
        ...

    @abstractmethod
    def idx(self, image_id):
        ...

    @abstractmethod
    def image_ids(self) -> list:
        ...

    def predict_dataloader(self):
        return SurveyPredictIterator(self)


class SurveyPredictIterator:
    """Yields calibrated, aligned, cropped images ready for inference
    (survey.py:59-107)."""

    def __init__(self, survey):
        self.survey = survey

    @classmethod
    def crop_to_mult16(cls, x):
        height = x.shape[1] - (x.shape[1] % 16)
        width = x.shape[2] - (x.shape[2] % 16)
        return x[:, :height, :width]

    def __getitem__(self, idx):
        item = self.survey[idx]
        images = np.asarray(item["image"], dtype=np.float64)

        images = images - np.asarray(item.get("background", 0.0))
        images = images / item["flux_calibration"][:, None, :]

        if getattr(self.survey, "align_to_band", None) is not None:
            images = align(
                images,
                wcs_list=item["wcs"],
                ref_band=self.survey.align_to_band,
            )

        psf_params = item["psf_params"]
        if getattr(self.survey, "crop_to_bands", None) is not None:
            images = images[self.survey.crop_to_bands]
            psf_params = psf_params[self.survey.crop_to_bands]

        if getattr(self.survey, "crop_to_hw", None) is not None:
            r1, r2, c1, c2 = self.survey.crop_to_hw
            images = images[:, r1:r2, c1:c2]

        images = self.crop_to_mult16(np.asarray(images, dtype=np.float32))
        return {"images": images, "psf_params": psf_params}

    def __len__(self):
        return len(self.survey)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
