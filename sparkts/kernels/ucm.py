"""UCM — unobserved-components (structural) state-space models.

The reference wraps statsmodels' UnobservedComponents behind a Kalman
filter (reference ucm.py:47-549, convenience classes LocalLevel /
LocalLinearTrend / SmoothTrend ucm.py:484-549). statsmodels is not
available here, so the linear-gaussian Kalman filter is implemented
directly (standard published recursions, Harvey 1989) with a composable
component spec matching the reference's surface:

* level forms: 'local level' (random-walk level), 'local linear trend'
  (stochastic level + slope), 'smooth trend' (integrated random walk),
  'random walk with drift' (stochastic level + deterministic drift);
* seasonal(m): (m−1)-state dummy seasonal (Σ of m consecutive seasonal
  states = noise), optionally stochastic;
* cycle: damped stochastic trigonometric cycle with estimated frequency
  λ ∈ 2π/(period bounds, default (1.5, 12)) and damping ρ;
* autoregressive(p): companion-form AR(p) component with free coefficients;
* irregular: observation noise on/off.

Variances are MLE via Nelder-Mead on log-variance scale (plus λ, ρ, and AR
coefficients where present); the likelihood is the prediction-error
decomposition with a large-kappa diffuse-ish initial covariance. Forecast
std errors propagate the filtered covariance through the transition.
"""

from __future__ import annotations

import numpy as np

from sparkts.kernels.base import Model
from sparkts.kernels.optim import nelder_mead

_BIG = 1e7

_LEVEL_FORMS = {
    "local level": "llevel", "llevel": "llevel",
    "local linear trend": "lltrend", "lltrend": "lltrend",
    "smooth trend": "strend", "strend": "strend",
    "random walk with drift": "rwdrift", "rwdrift": "rwdrift",
}


def _kalman(y, T, Z, Q, H, P0_scale=_BIG, fast=False):
    """Filter; returns (loglik, x_filt, P_filt, fitted).

    ``fast=True`` freezes the gain once the covariance recursion has
    converged (standard steady-state shortcut; changes the likelihood by
    ≤1e-10 relative) — used ONLY inside the MLE objective, never for the
    final filter pass that produces states/fitted/forecasts, so model
    outputs for given parameters are bit-identical to the exact filter
    (the driver's pinned-variance SQL oracle replays that exact path)."""
    n = y.size
    k = T.shape[0]
    x = np.zeros(k)
    P = np.eye(k) * P0_scale
    ll = 0.0
    fitted = np.empty(n)
    steady = False
    S = 0.0
    K = np.zeros(k)
    for t in range(n):
        if t > 0:
            x = T @ x
            if not steady:
                P = T @ P @ T.T + Q
        yhat = Z @ x
        fitted[t] = yhat
        v = y[t] - yhat
        if steady:
            ll += -0.5 * (np.log(2 * np.pi * S) + v * v / S)
            x = x + K * v
            continue
        S = float(Z @ P @ Z.T) + H
        if S <= 0:
            return -np.inf, x, P, fitted
        ll += -0.5 * (np.log(2 * np.pi * S) + v * v / S)
        K = (P @ Z.T) / S
        x = x + K * v
        Pn = P - np.outer(K, Z @ P)
        if fast and t > 0 and np.abs(Pn - P_upd_prev).max() <= 1e-10 * (
                1.0 + np.abs(Pn).max()):
            steady = True
        P_upd_prev = Pn
        P = Pn
    return ll, x, P, fitted


class UCM(Model):
    """Composable structural model (reference ucm.py:47 surface subset:
    level forms + seasonal + cycle + autoregressive + irregular)."""

    tunable = True

    def __init__(self, level: bool | str = "local level",
                 seasonal: int | None = None, cycle: bool = False,
                 autoregressive: int | None = None, irregular: bool = True,
                 stochastic_level: bool = True, stochastic_trend: bool = True,
                 stochastic_seasonal: bool = True,
                 stochastic_cycle: bool = False, damped_cycle: bool = False,
                 cycle_period_bounds: tuple | None = None,
                 fixed: dict | None = None,
                 alias: str | None = None):
        super().__init__(alias or "UCM")
        #: pinned parameters by spec name (log_var_irr, log_var_level,
        #: log_var_trend, log_var_seas, log_var_cycle, log_var_ar,
        #: cycle_freq, cycle_rho, ar1…) — values on the SAME scale the
        #: optimizer uses (log-variances are relative to var(y)). With
        #: everything pinned the fit is one deterministic Kalman pass.
        self.fixed = dict(fixed) if fixed else {}
        if level is True:
            level = "local level"
        if isinstance(level, str):
            try:
                self.level = _LEVEL_FORMS[level.lower()]
            except KeyError:
                raise ValueError(
                    f"unknown UCM level form {level!r}; one of "
                    f"{sorted(set(_LEVEL_FORMS))}")
        else:
            self.level = None
        self.seasonal = int(seasonal) if seasonal else None
        self.cycle = bool(cycle)
        self.ar = int(autoregressive) if autoregressive else None
        self.irregular = bool(irregular)
        self.stochastic_level = stochastic_level
        self.stochastic_trend = stochastic_trend
        self.stochastic_seasonal = stochastic_seasonal
        self.stochastic_cycle = stochastic_cycle
        self.damped_cycle = damped_cycle
        self.cycle_period_bounds = cycle_period_bounds or (1.5, 12.0)
        if not (self.level or self.seasonal or self.cycle or self.ar):
            raise ValueError("UCM needs at least one structural component")

    # -- spec construction ------------------------------------------------
    def _spec(self):
        """Static layout: state size, Z, static T entries, and the free
        parameter table [(name, lo, hi, x0)]. Dynamic T/Q entries (cycle
        rotation, AR coefficients, variances) are filled per evaluation."""
        k = 0
        z_idx = []            # state indices observed with weight 1
        params: list[tuple] = []
        layout = {}
        if self.irregular:
            params.append(("log_var_irr", -20.0, 5.0, -1.0))
        if self.level:
            layout["level"] = k
            z_idx.append(k)
            if self.level == "llevel":
                k += 1
                if self.stochastic_level:
                    params.append(("log_var_level", -20.0, 5.0, -1.0))
            else:  # two-state trend forms
                k += 2
                if self.level in ("lltrend", "rwdrift") and self.stochastic_level:
                    params.append(("log_var_level", -20.0, 5.0, -1.0))
                if self.level in ("lltrend", "strend") and self.stochastic_trend:
                    params.append(("log_var_trend", -20.0, 5.0, -2.0))
                # rwdrift: drift state is deterministic (no variance)
        if self.seasonal:
            layout["seasonal"] = k
            z_idx.append(k)
            k += self.seasonal - 1
            if self.stochastic_seasonal:
                params.append(("log_var_seas", -20.0, 5.0, -2.0))
        if self.cycle:
            layout["cycle"] = k
            z_idx.append(k)
            k += 2
            lo_p, hi_p = self.cycle_period_bounds
            params.append(("cycle_freq", 2 * np.pi / hi_p, 2 * np.pi / lo_p,
                           2 * np.pi / (0.5 * (lo_p + hi_p))))
            if self.damped_cycle:
                params.append(("cycle_rho", 0.01, 0.999, 0.9))
            if self.stochastic_cycle:
                params.append(("log_var_cycle", -20.0, 5.0, -2.0))
        if self.ar:
            layout["ar"] = k
            z_idx.append(k)
            k += self.ar
            for j in range(self.ar):
                params.append((f"ar{j + 1}", -0.999, 0.999,
                               0.5 if j == 0 else 0.0))
            params.append(("log_var_ar", -20.0, 5.0, -1.0))
        Z = np.zeros(k)
        Z[z_idx] = 1.0
        return k, Z, layout, params

    def _build(self, x, k, layout, params, var_y):
        d = dict(zip([p[0] for p in params], x))
        T = np.zeros((k, k))
        Q = np.zeros((k, k))
        H = var_y * np.exp(d["log_var_irr"]) if self.irregular else 0.0
        if self.level:
            i = layout["level"]
            if self.level == "llevel":
                T[i, i] = 1.0
                if self.stochastic_level:
                    Q[i, i] = var_y * np.exp(d["log_var_level"])
            else:
                T[i, i] = T[i, i + 1] = T[i + 1, i + 1] = 1.0
                if self.level == "lltrend":
                    if self.stochastic_level:
                        Q[i, i] = var_y * np.exp(d["log_var_level"])
                    if self.stochastic_trend:
                        Q[i + 1, i + 1] = var_y * np.exp(d["log_var_trend"])
                elif self.level == "strend":
                    if self.stochastic_trend:
                        Q[i + 1, i + 1] = var_y * np.exp(d["log_var_trend"])
                # rwdrift: stochastic level, deterministic drift state
                elif self.level == "rwdrift" and self.stochastic_level:
                    Q[i, i] = var_y * np.exp(d["log_var_level"])
        if self.seasonal:
            i = layout["seasonal"]
            m1 = self.seasonal - 1
            T[i, i:i + m1] = -1.0
            for j in range(1, m1):
                T[i + j, i + j - 1] = 1.0
            if self.stochastic_seasonal:
                Q[i, i] = var_y * np.exp(d["log_var_seas"])
        if self.cycle:
            i = layout["cycle"]
            lam = d["cycle_freq"]
            rho = d.get("cycle_rho", 1.0)
            c, s = np.cos(lam), np.sin(lam)
            T[i, i], T[i, i + 1] = rho * c, rho * s
            T[i + 1, i], T[i + 1, i + 1] = -rho * s, rho * c
            if self.stochastic_cycle:
                qc = var_y * np.exp(d["log_var_cycle"])
                Q[i, i] = Q[i + 1, i + 1] = qc
        if self.ar:
            i = layout["ar"]
            for j in range(self.ar):
                T[i, i + j] = d[f"ar{j + 1}"]
            for j in range(1, self.ar):
                T[i + j, i + j - 1] = 1.0
            Q[i, i] = var_y * np.exp(d["log_var_ar"])
        return T, Q, H

    # -- fit/forecast ------------------------------------------------------
    def _fit(self, y):
        y = np.asarray(y, dtype=np.float64)
        k, Z, layout, params = self._spec()
        if y.size < k + 2:
            raise ValueError(f"{self.alias}: series too short ({y.size}) "
                             f"for {k} states")
        var_y = max(float(np.var(y)), 1e-8)

        names = [p[0] for p in params]
        unknown = set(self.fixed) - set(names)
        if unknown:
            raise ValueError(
                f"fixed refers to unknown parameters {sorted(unknown)}; "
                f"valid: {names}")
        fixed_full = np.array([self.fixed.get(nm, np.nan) for nm in names])
        free = np.isnan(fixed_full)

        def nll_full(x):
            T, Q, H = self._build(x, k, layout, params, var_y)
            if not self.irregular and not Q.any():
                return np.inf
            ll, *_ = _kalman(y, T, Z, Q, H, fast=True)
            return -ll if np.isfinite(ll) else np.inf

        x0 = np.array([p[3] for p in params])
        lo = np.array([p[1] for p in params])
        hi = np.array([p[2] for p in params])
        x0[~free] = fixed_full[~free]
        if not free.any():
            xb = x0
        else:
            def nll(xf):
                x = x0.copy()
                x[free] = xf
                return nll_full(x)

            xf, fb = nelder_mead(nll, x0[free], lo[free], hi[free],
                                 max_iter=600, tol_std=1e-8)
            for _ in range(2):  # incumbent restart (multi-modal cycle freq)
                cand, fcand = nelder_mead(nll, xf, lo[free], hi[free],
                                          max_iter=600, tol_std=1e-8,
                                          init_step=0.3)
                if fcand >= fb - 1e-10:
                    break
                xf, fb = cand, fcand
            xb = x0.copy()
            xb[free] = xf
        T, Q, H = self._build(xb, k, layout, params, var_y)
        return {"T": T, "Z": Z, "Q": Q, "H": H, "params": xb, "y": y}

    def fit_state(self, y):
        return self._fit(np.asarray(y, dtype=np.float64))

    def forward(self, state, y, h, level=None, fitted=False):
        from sparkts.kernels.base import add_intervals

        y = np.asarray(y, dtype=np.float64)
        T, Z, Q, H = state["T"], state["Z"], state["Q"], state["H"]
        ll, x, P, fitted_vals = _kalman(y, T, Z, Q, H)
        mean, se = self._propagate(T, Z, Q, H, x, P, h)
        res = {"mean": mean}
        if fitted:
            res["fitted"] = fitted_vals
        if level:
            add_intervals(res, se, level)
        return res

    @staticmethod
    def _propagate(T, Z, Q, H, x, P, h):
        mean = np.empty(h)
        se = np.empty(h)
        for i in range(h):
            x = T @ x
            P = T @ P @ T.T + Q
            mean[i] = Z @ x
            se[i] = np.sqrt(max(float(Z @ P @ Z.T) + H, 0.0))
        return mean, se

    def _forecast(self, y, h, fitted):
        fit = self._fit(np.asarray(y, dtype=np.float64))
        T, Z, Q, H = fit["T"], fit["Z"], fit["Q"], fit["H"]
        ll, x, P, fitted_vals = _kalman(fit["y"], T, Z, Q, H)
        mean, se = self._propagate(T, Z, Q, H, x, P, h)
        return mean, se, fitted_vals if fitted else None


class LocalLevel(UCM):
    """Random-walk-plus-noise structural model (reference ucm.py:484)."""

    def __init__(self, alias: str | None = None):
        super().__init__(level="local level", alias=alias or "LocalLevel")


class LocalLinearTrend(UCM):
    """Level + slope, both stochastic (reference ucm.py:505)."""

    def __init__(self, alias: str | None = None):
        super().__init__(level="local linear trend",
                         alias=alias or "LocalLinearTrend")


class SmoothTrend(UCM):
    """Integrated random walk: stochastic slope, deterministic level step
    (reference ucm.py:528)."""

    def __init__(self, alias: str | None = None):
        super().__init__(level="smooth trend", alias=alias or "SmoothTrend")
