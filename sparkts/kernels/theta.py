"""Theta-family kernels: STM / OTM / DSTM / DOTM and AutoTheta.

Re-derivation of the reference's theta stack (reference theta.py +
src/theta.cpp). The model is a state-space over
(level, mean_y, A_n, B_n, mu):

  mu_i    = level_{i-1} + (1 − 1/θ)·(A·(1−α)^i + B·(1 − (1−α)^{i+1})/α)
  level_i = α·y_i + (1−α)·level_{i-1}
  dynamic variants (DSTM/DOTM) update the trend line (A, B) recursively
  (src/theta.cpp:42-64); static variants (STM/OTM) fix it from the OLS line.

Fitting: Nelder-Mead on scaled burn-in SSE (src/theta.cpp:126-155 target_fn;
objective = Σ_{i≥3} e_i² / mean|y|), optimizing (level₀, α[, θ]) with bounds
α ∈ [0.1, 0.99], θ ∈ [1, 1e10] (theta.py:92-101). OTM/DOTM optimize θ;
STM/DSTM pin θ=2.

AutoTheta (theta.py:470-551): ACF seasonality test at lag m (90%
two-sided ⇒ |r_m|/SE > Φ⁻¹(0.95)), classical seasonal decomposition
(statsmodels-style, re-implemented in numpy — no statsmodels here),
deseasonalize, fit all four variants, pick min MSE, re-seasonalize with a
seasonal-naive forecast of the seasonal component (theta.py:499).

Intervals are simulation-based (theta.py:268-327 compute_pi_samples) with a
fixed seed per call — deterministic under any partitioning.
"""

from __future__ import annotations

import numpy as np

from sparkts.kernels.base import Model, norm_ppf
from sparkts.kernels.basic import _tile_seasonal
from sparkts.kernels.optim import nelder_mead

_MODEL_TYPES = ("STM", "OTM", "DSTM", "DOTM")
_DYNAMIC = {"DSTM", "DOTM"}
_OPT_THETA = {"OTM", "DOTM"}


# --------------------------------------------------------------------------- #
# state recursion (numpy mirror of src/theta.cpp:22-105)
# --------------------------------------------------------------------------- #

def _init_state(y, model_type, level0, alpha, theta):
    if model_type in _DYNAMIC:
        an, bn, mu = y[0], 0.0, y[0]
    else:
        n = y.size
        y_mean = y.mean()
        weighted = float(y @ np.arange(1, n + 1)) / n
        bn = (6 * (2 * weighted - (n + 1) * y_mean)) / (n * n - 1)
        an = y_mean - (n + 1) * bn / 2
        mu = level0 + (1 - 1 / theta) * (an + bn)
    return np.array([alpha * y[0] + (1 - alpha) * level0, y[0], an, bn, mu])


def _update(states, i, model_type, alpha, theta, y_i, usemu):
    level, meany, an, bn = states[i - 1, 0], states[i - 1, 1], states[i - 1, 2], states[i - 1, 3]
    c = 1 - alpha
    states[i, 4] = level + (1 - 1 / theta) * (
        an * c**i + bn * (1 - c ** (i + 1)) / alpha
    )
    if usemu:
        y_i = states[i, 4]
    states[i, 0] = alpha * y_i + c * level
    states[i, 1] = (i * meany + y_i) / (i + 1)
    if model_type in _DYNAMIC:
        states[i, 3] = ((i - 1) * bn + 6 * (y_i - meany) / (i + 1)) / (i + 2)
        states[i, 2] = states[i, 1] - states[i, 3] * (i + 2) / 2
    else:
        states[i, 2], states[i, 3] = an, bn


def _forecast_from(states, i, model_type, h, alpha, theta):
    """h-step rollout feeding mu back as the observation (usemu=True).
    Only the (i−1)-th state row is needed; absolute index i drives the
    (1−α)^i terms, so it is carried explicitly (O(h) not O(i+h))."""
    level, meany, an, bn = states[i - 1, :4]
    c = 1 - alpha
    k = 1 - 1 / theta
    dynamic = model_type in _DYNAMIC
    f = np.empty(h)
    for j in range(h):
        idx = i + j
        mu = level + k * (an * c**idx + bn * (1 - c ** (idx + 1)) / alpha)
        f[j] = mu
        new_level = alpha * mu + c * level
        new_meany = (idx * meany + mu) / (idx + 1)
        if dynamic:
            bn = ((idx - 1) * bn + 6 * (mu - meany) / (idx + 1)) / (idx + 2)
            an = new_meany - bn * (idx + 2) / 2
        level, meany = new_level, new_meany
    return f


def _calc(y, model_type, level0, alpha, theta, nmse):
    """Run the filter; returns (amse, e, states, objective) — objective is
    burn-in-trimmed SSE scaled by mean|y| (src/theta.cpp:80-105)."""
    n = y.size
    states = np.zeros((n, 5))
    states[0] = _init_state(y, model_type, level0, alpha, theta)
    e = np.zeros(n)
    e[0] = y[0] - states[0, 4]
    amse = np.zeros(nmse)
    denom = np.zeros(nmse)
    for i in range(1, n):
        f = _forecast_from(states, i, model_type, nmse, alpha, theta)
        e[i] = y[i] - f[0]
        for j in range(nmse):
            if i + j < n:
                denom[j] += 1.0
                tmp = y[i + j] - f[j]
                amse[j] = (amse[j] * (denom[j] - 1.0) + tmp * tmp) / denom[j]
        _update(states, i, model_type, alpha, theta, y[i], usemu=False)
    mean_y = max(float(np.abs(y).mean()), 1e-10)
    obj = float((e[3:] ** 2).sum()) / mean_y
    return amse, e, states, obj


# --------------------------------------------------------------------------- #
# fitting (theta.py:25-141 semantics)
# --------------------------------------------------------------------------- #

def theta_fit(y, m, model_type, nmse=3, fixed=None):
    """``fixed`` pins parameters by name (initial_smoothed / alpha / theta)
    — with everything pinned the fit is one deterministic filter pass (how
    the driver's SQL oracle and the R goldens drive the recursion)."""
    y = np.asarray(y, dtype=np.float64)
    level0, alpha, theta = y[0] / 2, 0.5, 2.0
    opt_theta = model_type in _OPT_THETA
    names = ["initial_smoothed", "alpha"] + (["theta"] if opt_theta else [])
    x0 = np.array([level0, alpha] + ([theta] if opt_theta else []))
    lower = np.array([-1e10, 0.1] + ([1.0] if opt_theta else []))
    upper = np.array([1e10, 0.99] + ([1e10] if opt_theta else []))
    fixed = dict(fixed or {})
    freeze = np.zeros(x0.size, dtype=bool)
    for i, nm in enumerate(names):
        if nm in fixed:
            # the sentinel "default" freezes at the data-derived seed
            # (initial_smoothed = y[0]/2 — per series, so a static value
            # can't express it)
            if fixed[nm] != "default":
                x0[i] = fixed[nm]
            freeze[i] = True
    free = ~freeze

    def objective_full(x):
        lv, al = x[0], x[1]
        th = x[2] if opt_theta else 2.0
        try:
            _, _, _, obj = _calc(y, model_type, lv, al, th, nmse)
        except (FloatingPointError, OverflowError):
            return 1e10
        if not np.isfinite(obj):
            return 1e10
        return max(obj, -1e10)

    if not free.any():
        x_best = x0
    else:
        def objective(xf):
            x = x0.copy()
            x[free] = xf
            return objective_full(x)

        xf, _ = nelder_mead(objective, x0[free], lower[free], upper[free])
        x_best = x0.copy()
        x_best[free] = xf
    lv, al = float(x_best[0]), float(x_best[1])
    th = float(x_best[2]) if opt_theta else 2.0
    amse, e, states, mse = _calc(y, model_type, lv, al, th, nmse)
    return {
        "model_type": model_type,
        "par": {"initial_smoothed": lv, "alpha": al, "theta": th},
        "residuals": e,
        "states": states,
        "amse": amse,
        "mse": mse,
        "n": y.size,
        "mean_y": float(y.mean()),
        "m": m,
    }


# --------------------------------------------------------------------------- #
# classical seasonal decomposition (statsmodels-equivalent, numpy only)
# --------------------------------------------------------------------------- #

def seasonal_component(y, m, kind="multiplicative"):
    """Seasonal component à la statsmodels.seasonal_decompose: centered-MA
    trend, detrend, per-phase nan-means normalized to mean 0 (add) / 1 (mul),
    tiled to len(y)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if m % 2 == 0:
        filt = np.concatenate(([0.5], np.ones(m - 1), [0.5])) / m
    else:
        filt = np.ones(m) / m
    half = filt.size // 2
    trend = np.full(n, np.nan)
    conv = np.convolve(y, filt[::-1], mode="valid")
    trend[half : half + conv.size] = conv
    detr = y - trend if kind == "additive" else y / trend
    phases = np.arange(n) % m
    pavg = np.array([np.nanmean(detr[phases == p]) for p in range(m)])
    pavg = pavg - pavg.mean() if kind == "additive" else pavg / pavg.mean()
    return pavg[phases]


def _acf(y, nlags):
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    d = y - y.mean()
    denom = float(d @ d)
    return np.array(
        [1.0] + [float(d[: n - k] @ d[k:]) / denom for k in range(1, nlags + 1)]
    )


def seasonality_test(y, m):
    """90% ACF test at lag m (theta.py:516-520)."""
    r = _acf(y, m)[1:]
    stat = np.sqrt((1 + 2 * np.sum(r[:-1] ** 2)) / len(y))
    return bool(np.abs(r[-1]) / stat > norm_ppf(0.95))


def auto_theta(y, m, model=None, nmse=3, decomposition_type="multiplicative",
               fixed=None):
    """Fit the best theta variant with optional seasonal adjustment
    (reference theta.py:470-551 semantics)."""
    y = np.asarray(y, dtype=np.float64)
    decompose = False
    seas = None
    if m >= 4 and y.size >= 2 * m:
        decompose = seasonality_test(y, m)
    if decompose:
        if decomposition_type == "multiplicative" and y.min() <= 0:
            decomposition_type = "additive"
        seas = seasonal_component(y, m, decomposition_type)
        if decomposition_type == "multiplicative" and np.any(seas < 0.01):
            decomposition_type = "additive"
            seas = seasonal_component(y, m, "additive")
        y_work = y - seas if decomposition_type == "additive" else y / seas
    else:
        y_work = y

    candidates = [model] if model else list(_MODEL_TYPES)
    best = None
    for mt in candidates:
        fit = theta_fit(y_work, m, mt, nmse, fixed=fixed)
        if np.isfinite(fit["mse"]) and (best is None or fit["mse"] < best["mse"]):
            best = fit
    if best is None:
        raise RuntimeError("no theta model could be fitted")
    if decompose:
        # seasonal-naive forecast of the seasonal component (theta.py:499)
        season_vals = seas[-m:]
        if decomposition_type == "multiplicative":
            best["residuals"] = best["residuals"] * seas
        else:
            best["residuals"] = best["residuals"] + seas
        best["decompose"] = True
        best["decomposition_type"] = decomposition_type
        best["seas_forecast"] = season_vals
    return best


def _pi_samples(fit, h, sigma, n_samples=200, seed=0):
    """Simulated future paths (theta.py:268-327): roll the state forward
    feeding back sampled observations."""
    n = fit["n"]
    alpha = fit["par"]["alpha"]
    theta = fit["par"]["theta"]
    smoothed, _, a, b, _ = fit["states"][-1]
    mean_y = fit["mean_y"]
    rng = np.random.default_rng(seed)
    samples = np.empty((h, n_samples))
    c = 1 - alpha
    for step, i in enumerate(range(n, n + h)):
        mu = smoothed + (1 - 1 / theta) * (a * c**i + b * (1 - c ** (i + 1)) / alpha)
        s = mu + rng.normal(0.0, sigma, n_samples)
        samples[step] = s
        smoothed = alpha * s + c * smoothed
        mean_y = (i * mean_y + s) / (i + 1)
        b = ((i - 1) * b + 6 * (s - mean_y) / (i + 1)) / (i + 2)
        a = mean_y - b * (i + 2) / 2
    return samples


def forecast_theta(fit, h, level=None, seed=0):
    n = fit["n"]
    states = fit["states"]
    alpha = fit["par"]["alpha"]
    theta = fit["par"]["theta"]
    mean = _forecast_from(states, n, fit["model_type"], h, alpha, theta)
    res = {"mean": mean}
    if level:
        resid = fit["residuals"][3:]
        sigma = float(np.std(resid if resid.size >= 2 else fit["residuals"], ddof=1))
        samples = _pi_samples(fit, h, sigma, seed=seed)
        for lv in sorted(level):
            lo_q = (100 - lv) / 200
            res[f"lo-{lv}"] = np.quantile(samples, lo_q, axis=1)
            res[f"hi-{lv}"] = np.quantile(samples, lo_q + lv / 100, axis=1)
    if fit.get("decompose"):
        sf = _tile_seasonal(np.asarray(fit["seas_forecast"]), h)
        for k in res:
            res[k] = res[k] * sf if fit["decomposition_type"] == "multiplicative" else res[k] + sf
    return res


# --------------------------------------------------------------------------- #
# Model classes (reference models.py: AutoTheta :1310, Theta :6428,
# OptimizedTheta :6458, DynamicTheta :6488, DynamicOptimizedTheta :6519)
# --------------------------------------------------------------------------- #

class AutoTheta(Model):
    """Select among STM/OTM/DSTM/DOTM by in-sample MSE."""

    _fixed_type: str | None = None
    #: the Nelder-Mead search over (level0, α[, θ]) and the variant pick are
    #: tuned parameters — refit=False must NOT silently re-run them
    #: (reference forward_theta pins them, theta.py:549-562)
    tunable = True

    def __init__(
        self,
        season_length: int = 1,
        decomposition_type: str = "multiplicative",
        fixed_params: dict | None = None,
        alias: str | None = None,
    ):
        super().__init__(alias or type(self).__name__)
        self.season_length = int(season_length)
        self.decomposition_type = decomposition_type
        #: pinned parameters (initial_smoothed / alpha / theta)
        self.fixed_params = dict(fixed_params) if fixed_params else None

    def forecast(self, y, h, level=None, fitted=False):
        y = np.asarray(y, dtype=np.float64)
        if np.all(y == y[0]):  # constant series guard (theta.py:486)
            res = {"mean": np.full(h, y[0])}
            if fitted:
                res["fitted"] = y.copy()
            for lv in sorted(level or []):
                res[f"lo-{lv}"] = res["mean"].copy()
                res[f"hi-{lv}"] = res["mean"].copy()
            return res
        fit = auto_theta(
            y, self.season_length, model=self._fixed_type,
            decomposition_type=self.decomposition_type,
            fixed=self.fixed_params,
        )
        res = forecast_theta(fit, h, level=level)
        if fitted:
            res["fitted"] = y - fit["residuals"]
        return res

    # ---- forward contract (reference forward_theta, theta.py:549-562) ----
    def fit_state(self, y, X=None):
        """Reusable state: the SELECTED variant + its optimized
        (initial_smoothed, alpha, theta). Constant series short-circuit
        (the constant guard in forecast never fits)."""
        y = np.asarray(y, dtype=np.float64)
        if np.all(y == y[0]):
            return {"constant": True}
        fit = auto_theta(
            y, self.season_length, model=self._fixed_type,
            decomposition_type=self.decomposition_type,
            fixed=self.fixed_params,
        )
        return {"model_type": fit["model_type"], "par": dict(fit["par"])}

    def forward(self, state, y, h, level=None, fitted=False,
                X=None, X_future=None):
        """Re-apply the fitted variant + parameters to (possibly longer)
        data — the reference's forward_theta re-runs auto_theta with model
        and all three parameters pinned (theta.py:549-562): one
        deterministic filter pass, zero Nelder-Mead calls. The seasonality
        test / decomposition re-runs on the new data, exactly as the
        reference's pinned auto_theta does."""
        y = np.asarray(y, dtype=np.float64)
        if state.get("constant") or np.all(y == y[0]):
            return self.forecast(y, h, level=level, fitted=fitted)
        fit = auto_theta(
            y, self.season_length, model=state["model_type"],
            decomposition_type=self.decomposition_type,
            fixed=state["par"],
        )
        res = forecast_theta(fit, h, level=level)
        if fitted:
            res["fitted"] = y - fit["residuals"]
        return res


class Theta(AutoTheta):
    _fixed_type = "STM"


class OptimizedTheta(AutoTheta):
    _fixed_type = "OTM"


class DynamicTheta(AutoTheta):
    _fixed_type = "DSTM"


class DynamicOptimizedTheta(AutoTheta):
    _fixed_type = "DOTM"
