"""Kernel contract + shared interval math.

Re-derivation of the reference's ``_TS`` model contract (reference
models.py:177-249): every model exposes
``forecast(y, h, level=None, fitted=False) -> dict`` where the dict holds
``mean`` (h-vector), optional ``fitted`` (len(y)-vector of one-step in-sample
predictions), and per confidence level ``lo-{l}`` / ``hi-{l}`` h-vectors.
``repr(model)`` (the ``alias``) names the output columns, matching the
reference's column-naming scheme (models.py:185-186, core.py:126-130).

These kernels are plain numpy over a single series — they run inside
``applyInPandas`` Arrow batches (one call per series), never per-row.

No scipy in this environment: the gaussian quantile uses Acklam's rational
approximation of the inverse normal CDF (|rel err| < 1.15e-9), which is more
than enough for interval z-scores.
"""

from __future__ import annotations

import numpy as np

# --- Acklam inverse-normal-CDF rational approximation -----------------------
_A = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
      1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
_B = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
      6.680131188771972e01, -1.328068155288572e01]
_C = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
      -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
_D = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
      3.754408661907416e00]


def norm_ppf(p: float) -> float:
    """Inverse standard-normal CDF (Acklam's algorithm)."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0,1), got {p}")
    p_low, p_high = 0.02425, 1 - 0.02425
    if p < p_low:
        q = np.sqrt(-2 * np.log(p))
        return (((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4]) * q + _C[5]) / (
            (((_D[0] * q + _D[1]) * q + _D[2]) * q + _D[3]) * q + 1
        )
    if p <= p_high:
        q = p - 0.5
        r = q * q
        return (((((_A[0] * r + _A[1]) * r + _A[2]) * r + _A[3]) * r + _A[4]) * r + _A[5]) * q / (
            ((((_B[0] * r + _B[1]) * r + _B[2]) * r + _B[3]) * r + _B[4]) * r + 1
        )
    q = np.sqrt(-2 * np.log(1 - p))
    return -(((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4]) * q + _C[5]) / (
        (((_D[0] * q + _D[1]) * q + _D[2]) * q + _D[3]) * q + 1
    )


def add_intervals(res: dict, sigmah: np.ndarray, level: list[int] | None) -> dict:
    """Gaussian intervals: mean ± z(level)·sigmah (reference utils.py:302-318)."""
    if not level:
        return res
    mean = res["mean"]
    for lv in sorted(level):
        z = norm_ppf(0.5 + lv / 200.0)
        res[f"lo-{lv}"] = mean - z * sigmah
        res[f"hi-{lv}"] = mean + z * sigmah
    return res


def residual_sigma(resid: np.ndarray, dof: int) -> float:
    """sqrt(nansum(res²)/dof) — the reference's sigma estimator (utils.py:321-328)."""
    dof = max(dof, 1)
    return float(np.sqrt(np.nansum(resid * resid) / dof))


class Model:
    """Base class: stateless per-series forecaster.

    Subclasses implement ``_forecast(y, h, fitted) -> (mean, sigmah, fitted_vals)``
    where ``sigmah`` is the h-vector of forecast-std-errors used for gaussian
    intervals (or None if the model can't produce native intervals).
    """

    uses_exog = False

    def __init__(self, alias: str | None = None):
        self.alias = alias or type(self).__name__

    def __repr__(self) -> str:
        return self.alias

    # subclass hook
    def _forecast(self, y: np.ndarray, h: int, fitted: bool):
        raise NotImplementedError

    def forecast(
        self,
        y: np.ndarray,
        h: int,
        level: list[int] | None = None,
        fitted: bool = False,
    ) -> dict:
        y = np.asarray(y, dtype=np.float64)
        mean, sigmah, fitted_vals = self._forecast(y, h, fitted or bool(level))
        res = {"mean": np.asarray(mean, dtype=np.float64)}
        if fitted and fitted_vals is not None:
            res["fitted"] = np.asarray(fitted_vals, dtype=np.float64)
        if level:
            if sigmah is None:
                raise ValueError(
                    f"{self.alias} has no native prediction intervals"
                )
            add_intervals(res, np.asarray(sigmah, dtype=np.float64), level)
        return res
