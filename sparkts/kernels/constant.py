"""Constant / testing models (reference models.py:6933-7100: ConstantModel,
ZeroModel, NaNModel) plus an always-failing model for fallback tests
(pattern of the reference's FailedFit mock, tests/test_core.py:124)."""

from __future__ import annotations

import numpy as np

from sparkts.kernels.base import Model


class ConstantModel(Model):
    def __init__(self, constant: float, alias: str | None = None):
        super().__init__(alias or "ConstantModel")
        self.constant = float(constant)

    def _forecast(self, y, h, fitted):
        mean = np.full(h, self.constant)
        fitted_vals = np.full(y.size, self.constant)
        sigmah = np.zeros(h)
        return mean, sigmah, fitted_vals


class ZeroModel(ConstantModel):
    def __init__(self, alias: str | None = None):
        super().__init__(0.0, alias or "ZeroModel")


class NaNModel(ConstantModel):
    def __init__(self, alias: str | None = None):
        super().__init__(float("nan"), alias or "NaNModel")


class FailingModel(Model):
    """Raises on every call — exercises fallback semantics (core.py:189-204)."""

    def _forecast(self, y, h, fitted):
        raise RuntimeError(f"{self.alias} always fails")
