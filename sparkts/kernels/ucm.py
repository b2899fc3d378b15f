"""UCM — unobserved-components (structural) state-space models.

The reference wraps statsmodels' UnobservedComponents behind a Kalman
filter (reference ucm.py:47-549, convenience classes LocalLevel /
LocalLinearTrend / SmoothTrend ucm.py:484-549). statsmodels is not
available here, so the linear-gaussian Kalman filter is implemented
directly (standard published recursions) for the three structural forms:

* LocalLevel:        y = μ + ε;  μ' = μ + η                (σ²_ε, σ²_η)
* LocalLinearTrend:  y = μ + ε;  μ' = μ + β + η;  β' = β + ζ
* SmoothTrend:       LocalLinearTrend with σ²_η ≡ 0 (integrated RW)

Variances are MLE via Nelder-Mead on log-variance scale; the likelihood is
the prediction-error decomposition with a diffuse-ish large initial
covariance. Forecast std errors come from the filtered covariance
propagated through the transition.
"""

from __future__ import annotations

import numpy as np

from sparkts.kernels.base import Model
from sparkts.kernels.optim import nelder_mead

_BIG = 1e7


def _kalman(y, T, Z, Q, H, P0_scale=_BIG):
    """Filter; returns (loglik_terms_sum, x_filt, P_filt, fitted)."""
    n = y.size
    k = T.shape[0]
    x = np.zeros(k)
    P = np.eye(k) * P0_scale
    ll = 0.0
    fitted = np.empty(n)
    for t in range(n):
        # predict
        if t > 0:
            x = T @ x
            P = T @ P @ T.T + Q
        yhat = Z @ x
        fitted[t] = yhat
        S = float(Z @ P @ Z.T) + H
        v = y[t] - yhat
        if S <= 0:
            return -np.inf, x, P, fitted
        ll += -0.5 * (np.log(2 * np.pi * S) + v * v / S)
        K = (P @ Z.T) / S
        x = x + K * v
        P = P - np.outer(K, Z @ P)
    return ll, x, P, fitted


class _UCM(Model):
    """Shared Kalman machinery; subclasses define the structural form."""

    tunable = True

    _n_state = 1
    _free_q = (0,)  # indices of state-noise variances that are free

    def _matrices(self):
        raise NotImplementedError

    def _forecast(self, y, h, fitted):
        y = np.asarray(y, dtype=np.float64)
        if y.size < self._n_state + 2:
            raise ValueError(f"{self.alias}: series too short ({y.size})")
        T, Z = self._matrices()
        k = T.shape[0]
        var_y = max(float(np.var(y)), 1e-8)
        nfree = 1 + len(self._free_q)  # obs variance + free state variances

        def build(params):
            # params are log-variances relative to var_y
            H = var_y * np.exp(params[0])
            Q = np.zeros((k, k))
            for i, qi in enumerate(self._free_q):
                Q[qi, qi] = var_y * np.exp(params[1 + i])
            return Q, H

        def nll(params):
            Q, H = build(params)
            ll, *_ = _kalman(y, T, Z, Q, H)
            return -ll if np.isfinite(ll) else np.inf

        x0 = np.full(nfree, -1.0)
        lo = np.full(nfree, -20.0)
        hi = np.full(nfree, 5.0)
        xb, _ = nelder_mead(nll, x0, lo, hi, max_iter=500, tol_std=1e-8)
        Q, H = build(xb)
        ll, x, P, fitted_vals = _kalman(y, T, Z, Q, H)
        mean = np.empty(h)
        se = np.empty(h)
        for i in range(h):
            x = T @ x
            P = T @ P @ T.T + Q
            mean[i] = Z @ x
            se[i] = np.sqrt(max(float(Z @ P @ Z.T) + H, 0.0))
        return mean, se, fitted_vals


class LocalLevel(_UCM):
    """Random-walk-plus-noise structural model (reference ucm.py:484)."""

    _n_state = 1
    _free_q = (0,)

    def __init__(self, alias: str | None = None):
        super().__init__(alias or "LocalLevel")

    def _matrices(self):
        return np.array([[1.0]]), np.array([1.0])


class LocalLinearTrend(_UCM):
    """Level + slope, both stochastic (reference ucm.py:505)."""

    _n_state = 2
    _free_q = (0, 1)

    def __init__(self, alias: str | None = None):
        super().__init__(alias or "LocalLinearTrend")

    def _matrices(self):
        return np.array([[1.0, 1.0], [0.0, 1.0]]), np.array([1.0, 0.0])


class SmoothTrend(_UCM):
    """Integrated random walk: stochastic slope, deterministic level step
    (reference ucm.py:528)."""

    _n_state = 2
    _free_q = (1,)

    def __init__(self, alias: str | None = None):
        super().__init__(alias or "SmoothTrend")

    def _matrices(self):
        return np.array([[1.0, 1.0], [0.0, 1.0]]), np.array([1.0, 0.0])


class UCM(_UCM):
    """Front door mirroring the reference's model-string subset
    (reference ucm.py:47): 'llevel' → LocalLevel, 'lltrend' →
    LocalLinearTrend, 'strend' → SmoothTrend."""

    _FORMS = {"llevel": LocalLevel, "lltrend": LocalLinearTrend,
              "strend": SmoothTrend}

    def __new__(cls, model: str = "llevel", alias: str | None = None):
        try:
            impl = cls._FORMS[model]
        except KeyError:
            raise ValueError(
                f"unknown UCM form {model!r}; one of {sorted(cls._FORMS)}")
        obj = impl(alias=alias or "UCM")
        return obj
