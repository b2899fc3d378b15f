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


class ConformalIntervals:
    """Conformal-prediction config (reference utils.py:331-357): ``h``-step
    scores from ``n_windows`` rolling-origin backtest windows; method
    'conformal_distribution' (quantiles over mean±score paths) or
    'conformal_error' (mean ± score quantile)."""

    def __init__(self, n_windows: int = 2, h: int = 1,
                 method: str = "conformal_distribution"):
        if n_windows < 2:
            raise ValueError("n_windows must be >= 2 for conformal intervals")
        if method not in ("conformal_distribution", "conformal_error"):
            raise ValueError(f"unknown conformal method {method!r}")
        self.n_windows = n_windows
        self.h = h
        self.method = method


def _conformal_scores(model, y: np.ndarray, h: int, n_windows: int) -> np.ndarray:
    """|forecast − actual| over rolling-origin windows (reference
    models.py:188-218): window w trains on y[:n−(n_windows−w)·h] and scores
    the next h points. Needs n > n_windows·h (reference core.py:632-653
    validates 2h+1 samples minimum)."""
    n = y.size
    if n <= n_windows * h:
        raise ValueError(
            f"conformal intervals need > n_windows*h = {n_windows * h} "
            f"observations, got {n}")
    cs = np.empty((n_windows, h))
    for w in range(n_windows):
        cut = n - (n_windows - w) * h
        mean = model._forecast(y[:cut].copy(), h, False)[0]
        cs[w] = np.abs(np.asarray(mean) - y[cut : cut + h])
    return cs


def conformal_intervals(res: dict, cs: np.ndarray, level: list[int],
                        method: str) -> dict:
    """Attach lo/hi columns from conformity scores (reference
    models.py:116-161: _conformal_distribution / _conformal_error)."""
    mean = res["mean"]
    if method == "conformal_distribution":
        paths = np.vstack([mean - cs, mean + cs])  # (2·w, h)
        for lv in sorted(level):
            alpha_lo, alpha_hi = (100 - lv) / 200.0, 1 - (100 - lv) / 200.0
            res[f"lo-{lv}"] = np.quantile(paths, alpha_lo, axis=0)
            res[f"hi-{lv}"] = np.quantile(paths, alpha_hi, axis=0)
    else:
        for lv in sorted(level):
            q = np.quantile(cs, lv / 100.0, axis=0)
            res[f"lo-{lv}"] = mean - q
            res[f"hi-{lv}"] = mean + q
    return res


class Model:
    """Base class: stateless per-series forecaster.

    Subclasses implement ``_forecast(y, h, fitted) -> (mean, sigmah, fitted_vals)``
    where ``sigmah`` is the h-vector of forecast-std-errors used for gaussian
    intervals (or None if the model can't produce native intervals — pass
    ``prediction_intervals=ConformalIntervals(...)`` to get conformal ones).
    """

    uses_exog = False

    def __init__(self, alias: str | None = None,
                 prediction_intervals: ConformalIntervals | None = None):
        self.alias = alias or type(self).__name__
        self.prediction_intervals = prediction_intervals

    def __repr__(self) -> str:
        return self.alias

    # subclass hook
    def _forecast(self, y: np.ndarray, h: int, fitted: bool):
        raise NotImplementedError

    # ------------------------------------------------------------------ #
    # forward contract (reference models.py:565-610): fit parameters once,
    # re-apply them to new data without re-optimizing. Required by
    # cross_validation(refit=False | int) (reference core.py:322-354,
    # validation core.py:1188-1200). Models without tunable parameters get
    # it for free (state = None → forward == forecast).

    #: True for models with tuned/optimized parameters: they must override
    #: fit_state/forward to honor refit=False, else cv(refit≠True) raises
    #: (matching the reference's forward-method validation).
    tunable = False

    def fit_state(self, y: np.ndarray):
        """Return the reusable parameter state for ``forward``. Default:
        parameter-free models return None."""
        if self.tunable:
            raise NotImplementedError(
                f"{self.alias} is parameterized but implements no forward; "
                "use refit=True")
        return None

    def forward(self, state, y: np.ndarray, h: int,
                level: list[int] | None = None, fitted: bool = False) -> dict:
        """Apply a previously fitted ``state`` to (possibly longer) data
        ``y``. Default = plain forecast — exactly correct for
        parameter-free models (there is nothing to re-apply)."""
        if self.tunable:
            raise NotImplementedError(
                f"{self.alias} is parameterized but implements no forward; "
                "use refit=True")
        return self.forecast(y, h, level=level, fitted=fitted)

    # exog-aware subclass hook (only called when uses_exog=True)
    def _forecast_exog(self, y, h, fitted, X, X_future):
        raise NotImplementedError

    def forecast(
        self,
        y: np.ndarray,
        h: int,
        level: list[int] | None = None,
        fitted: bool = False,
        X: np.ndarray | None = None,
        X_future: np.ndarray | None = None,
    ) -> dict:
        y = np.asarray(y, dtype=np.float64)
        if self.uses_exog:
            if X is None or X_future is None:
                raise ValueError(
                    f"{self.alias} uses exogenous regressors; pass X (train) "
                    "and X_future (h rows)")  # reference core.py:753-764
            mean, sigmah, fitted_vals = self._forecast_exog(
                y, h, fitted or bool(level), np.asarray(X, dtype=np.float64),
                np.asarray(X_future, dtype=np.float64))
        else:
            mean, sigmah, fitted_vals = self._forecast(y, h, fitted or bool(level))
        res = {"mean": np.asarray(mean, dtype=np.float64)}
        if fitted and fitted_vals is not None:
            res["fitted"] = np.asarray(fitted_vals, dtype=np.float64)
        if level:
            if self.prediction_intervals is not None:
                cs = _conformal_scores(self, y, h, self.prediction_intervals.n_windows)
                conformal_intervals(res, cs, level, self.prediction_intervals.method)
            elif sigmah is None:
                raise ValueError(
                    f"{self.alias} has no native prediction intervals; pass "
                    "prediction_intervals=ConformalIntervals(...)"
                )
            else:
                add_intervals(res, np.asarray(sigmah, dtype=np.float64), level)
        return res

    def simulate(
        self,
        y: np.ndarray,
        h: int,
        n_paths: int = 100,
        seed: int = 0,
        error_dist: str = "normal",
    ) -> np.ndarray:
        """(n_paths, h) sample trajectories: mean path + errors drawn from
        the in-sample residual distribution (reference simulation.py:106-243
        sample_errors; normal / laplace / bootstrap). The caller supplies a
        partition-independent seed — the engine derives it from
        (root_seed, unique_id), deliberately NOT the reference's positional
        scheme (core.py:972), which depends on group order."""
        y = np.asarray(y, dtype=np.float64)
        mean, _, fitted_vals = self._forecast(y, h, True)
        mean = np.asarray(mean, dtype=np.float64)
        if fitted_vals is not None:
            resid = y - np.asarray(fitted_vals, dtype=np.float64)
            resid = resid[np.isfinite(resid)]
        else:
            resid = np.empty(0)
        if resid.size < 3:
            resid = y - np.nanmean(y)
        rng = np.random.default_rng(seed)
        if error_dist == "normal":
            scale = float(np.sqrt(np.mean(resid**2)))
            errs = rng.normal(0.0, scale, size=(n_paths, h))
        elif error_dist == "laplace":
            b = float(np.mean(np.abs(resid - np.median(resid))))
            errs = rng.laplace(0.0, max(b, 1e-12), size=(n_paths, h))
        elif error_dist == "bootstrap":
            errs = rng.choice(resid, size=(n_paths, h), replace=True)
        else:
            raise ValueError(f"unknown error_dist {error_dist!r}")
        return mean[None, :] + errs
