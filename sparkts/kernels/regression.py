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
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            # a 1-D regressor vector of length n is one column, not one row
            X = X[:, None]
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


class Ridge(LinearRegression):
    """L2-regularized regression, closed form (XᵀX + αI)⁻¹Xᵀy with the
    intercept column unpenalized — a second exog model exercising the same
    contract with genuinely different coefficients (reference SklearnModel
    wraps sklearn.Ridge identically, models.py:6763)."""

    def __init__(self, alpha: float = 1.0, fit_intercept: bool = True,
                 alias: str | None = None, prediction_intervals=None):
        super().__init__(fit_intercept=fit_intercept, alias=alias or "Ridge",
                         prediction_intervals=prediction_intervals)
        if alpha < 0:
            raise ValueError(f"alpha must be >= 0, got {alpha}")
        self.ridge_alpha = float(alpha)

    def _solve(self, A, y):
        P = np.eye(A.shape[1]) * self.ridge_alpha
        if self.fit_intercept:
            P[0, 0] = 0.0
        return np.linalg.solve(A.T @ A + P, A.T @ y)

    def fit_state(self, y, X=None):
        if X is None:
            raise ValueError(f"{self.alias}.fit_state needs X")
        return {"beta": self._solve(self._design(X),
                                    np.asarray(y, dtype=np.float64))}

    def _forecast_exog(self, y, h, fitted, X, X_future):
        A, Af = self._design(X), self._design(X_future)
        if A.shape[0] != y.size:
            raise ValueError(
                f"X has {A.shape[0]} rows but y has {y.size}")
        if Af.shape[0] != h:
            raise ValueError(
                f"X_future has {Af.shape[0]} rows, expected h={h}")
        beta = self._solve(A, y)
        resid = y - A @ beta
        dof = max(y.size - A.shape[1], 1)
        sigmah = np.full(h, np.sqrt(float(resid @ resid) / dof))
        return Af @ beta, sigmah, (A @ beta if fitted else None)


class PolynomialRegression(LinearRegression):
    """OLS on polynomial-expanded regressors (each exog column raised to
    powers 1..degree). Exercises the contract with a non-linear response
    surface while staying closed-form."""

    def __init__(self, degree: int = 2, fit_intercept: bool = True,
                 alias: str | None = None, prediction_intervals=None):
        super().__init__(fit_intercept=fit_intercept,
                         alias=alias or "PolynomialRegression",
                         prediction_intervals=prediction_intervals)
        if degree < 1:
            raise ValueError(f"degree must be >= 1, got {degree}")
        self.degree = int(degree)

    def _design(self, X):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X[:, None]
        cols = [X**d for d in range(1, self.degree + 1)]
        A = np.hstack(cols)
        if self.fit_intercept:
            A = np.hstack([np.ones((A.shape[0], 1)), A])
        return A


class SklearnModel(Model):
    """Wrapper over ANY fit/predict regressor — the reference's
    SklearnModel surface (models.py:6763): ``regressor`` needs sklearn's
    duck type (``fit(X, y)`` then ``predict(X)``; cloned per series via
    get_params/set_params when available, else copy.deepcopy). No native
    intervals — pass ``prediction_intervals=ConformalIntervals(...)``, the
    reference's own recommendation for sklearn models."""

    uses_exog = True
    tunable = True

    def __init__(self, regressor, alias: str | None = None,
                 prediction_intervals=None):
        super().__init__(alias or type(regressor).__name__,
                         prediction_intervals=prediction_intervals)
        if not (hasattr(regressor, "fit") and hasattr(regressor, "predict")):
            raise TypeError(
                f"regressor {type(regressor).__name__} must implement "
                "fit(X, y) and predict(X)")
        self.regressor = regressor

    def _clone(self):
        import copy

        r = self.regressor
        if hasattr(r, "get_params") and hasattr(r, "set_params"):
            return type(r)(**r.get_params())
        return copy.deepcopy(r)

    def _forecast_exog(self, y, h, fitted, X, X_future):
        X = np.atleast_2d(np.asarray(X, dtype=np.float64))
        Xf = np.atleast_2d(np.asarray(X_future, dtype=np.float64))
        if Xf.shape[0] != h:
            raise ValueError(
                f"X_future has {Xf.shape[0]} rows, expected h={h}")
        reg = self._clone()
        reg.fit(X, np.asarray(y, dtype=np.float64))
        mean = np.asarray(reg.predict(Xf), dtype=np.float64)
        fitted_vals = (np.asarray(reg.predict(X), dtype=np.float64)
                       if fitted else None)
        return mean, None, fitted_vals

    def fit_state(self, y, X=None):
        if X is None:
            raise ValueError(f"{self.alias}.fit_state needs X")
        reg = self._clone()
        reg.fit(np.atleast_2d(np.asarray(X, dtype=np.float64)),
                np.asarray(y, dtype=np.float64))
        return {"regressor": reg}

    def forward(self, state, y, h, level=None, fitted=False,
                X=None, X_future=None):
        if X_future is None:
            raise ValueError(f"{self.alias}.forward needs X_future")
        reg = state["regressor"]
        Xf = np.atleast_2d(np.asarray(X_future, dtype=np.float64))
        res = {"mean": np.asarray(reg.predict(Xf), dtype=np.float64)}
        if fitted and X is not None:
            res["fitted"] = np.asarray(
                reg.predict(np.atleast_2d(np.asarray(X, dtype=np.float64))),
                dtype=np.float64)
        if level:
            if self.prediction_intervals is None:
                raise ValueError(
                    f"{self.alias} has no native intervals; pass "
                    "prediction_intervals=ConformalIntervals(...)")
            from sparkts.kernels.base import (_conformal_scores,
                                              conformal_intervals)

            cs = _conformal_scores(self, np.asarray(y, dtype=np.float64),
                                   self.prediction_intervals.h,
                                   self.prediction_intervals.n_windows, X=X)
            conformal_intervals(res, cs[:, :h], level,
                                self.prediction_intervals.method)
        return res
