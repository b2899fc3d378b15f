"""Exogenous-regressor models.

The reference wraps arbitrary sklearn regressors (reference
models.py:6763 SklearnModel, uses_exog=True); sklearn is not available in
this environment, so the engine ships a closed-form OLS model that exercises
the same contract: fit on (y, X), predict on X_future, gaussian intervals
from residual variance with the standard OLS prediction-variance term.
"""

from __future__ import annotations

import numpy as np

from sparkts.kernels.base import Model


class LinearRegression(Model):
    """OLS of y on exog columns (+ optional intercept). uses_exog=True —
    the engine feeds (X, X_future) through the co-grouped exog path
    (reference _cotransform, fugue.py:25-51)."""

    uses_exog = True
    tunable = True

    def __init__(self, fit_intercept: bool = True, alias: str | None = None,
                 prediction_intervals=None):
        super().__init__(alias or "LinearRegression",
                         prediction_intervals=prediction_intervals)
        self.fit_intercept = fit_intercept

    # -- forward contract: refit=False re-applies the stored beta ---------
    def fit_state(self, y, X=None):
        if X is None:
            raise ValueError(f"{self.alias}.fit_state needs X")
        A = self._design(X)
        y = np.asarray(y, dtype=np.float64)
        beta, *_ = np.linalg.lstsq(A, y, rcond=None)
        return {"beta": beta}

    def forward(self, state, y, h, level=None, fitted=False,
                X=None, X_future=None):
        from sparkts.kernels.base import add_intervals

        if X is None or X_future is None:
            raise ValueError(f"{self.alias}.forward needs X and X_future")
        beta = state["beta"]
        y = np.asarray(y, dtype=np.float64)
        A = self._design(X)
        Af = self._design(X_future)
        resid = y - A @ beta
        dof = max(y.size - A.shape[1], 1)
        sigma2 = float(resid @ resid) / dof
        mean = Af @ beta
        res = {"mean": mean}
        if fitted:
            res["fitted"] = A @ beta
        if level:
            AtA_inv = np.linalg.pinv(A.T @ A)
            lever = np.einsum("ij,jk,ik->i", Af, AtA_inv, Af)
            add_intervals(res, np.sqrt(sigma2 * (1.0 + lever)), level)
        return res

    def _design(self, X):
        X = np.atleast_2d(np.asarray(X, dtype=np.float64))
        if X.ndim == 2 and X.shape[0] == 1 and X.size > X.shape[1]:
            X = X.T
        if self.fit_intercept:
            return np.hstack([np.ones((X.shape[0], 1)), X])
        return X

    def _forecast_exog(self, y, h, fitted, X, X_future):
        A = self._design(X)
        Af = self._design(X_future)
        if A.shape[0] != y.size:
            raise ValueError(
                f"X has {A.shape[0]} rows but y has {y.size}")
        if Af.shape[0] != h:
            raise ValueError(
                f"X_future has {Af.shape[0]} rows, expected h={h}")  # core.py:737-751
        beta, *_ = np.linalg.lstsq(A, y, rcond=None)
        resid = y - A @ beta
        dof = max(y.size - A.shape[1], 1)
        sigma2 = float(resid @ resid) / dof
        mean = Af @ beta
        # prediction variance: sigma^2 * (1 + x' (A'A)^-1 x)
        AtA_inv = np.linalg.pinv(A.T @ A)
        lever = np.einsum("ij,jk,ik->i", Af, AtA_inv, Af)
        sigmah = np.sqrt(sigma2 * (1.0 + lever))
        fitted_vals = A @ beta if fitted else None
        return mean, sigmah, fitted_vals
