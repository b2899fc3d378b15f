"""CES — complex exponential smoothing (AutoCES).

Semantics re-derived from the published algorithm (Svetunkov & Kourentzes,
"Complex Exponential Smoothing") as realized by the reference
(reference ces.py:426-491 auto_ces; recursion src/ces.cpp:37-100
cesupdate/cesfcst; init states ces.py:27-52; bounds/seeds ces.py:110-190):

* season types N (non-seasonal), S (simple: lagged-m state pair),
  P (partial: + additive seasonal), F (full: + complex seasonal pair);
* state pair update  s0' = s0 − (1−α1)·s1 + (α0−α1)·e,
                     s1' = s0 + (1−α0)·s1 + (α0+α1)·e
  (lag 1 for N/P/F, lag m for S); partial seasonal s2' = s2 + β0·e;
  full seasonal pair mirrors the level pair with β0/β1;
* likelihood n·log Σe² over the forward pass, AICc with
  np = n_components + 1; parameter box [0.01, (1.8, 1.9, 1.5, 1.5)],
  seeds α=(1.3, 1.0), β=(0.1) for P / (1.3, 1.0) for F;
* 'Z' selects over {N,S,P,F} by AICc; m<2 or n<2m forces N.

Deviation (documented): the reference refines initial states with a
backfit (reverse) pass; here initial states stay at their heuristic values
— AICc ranking and forecasts agree to well within interval widths on the
reference's test fixtures. Intervals: h-step sigma from zero-error path
dispersion of simulated gaussian innovations (the reference also simulates;
ces.py:416-424).
"""

from __future__ import annotations

import numpy as np

from sparkts.kernels.base import Model
from sparkts.kernels.optim import nelder_mead

_N, _S, _P, _F = 0, 1, 2, 3
_CODES = {"N": _N, "S": _S, "P": _P, "F": _F}


def _classical_seasonal(y: np.ndarray, m: int) -> np.ndarray:
    """Additive seasonal indices by classical decomposition (centered 2×m
    MA detrend, phase means, zero-centered) — the seasonal_decompose the
    reference's initstate relies on (ces.py:44,48)."""
    n = y.size
    if n < 2 * m:
        s = y[:m] - np.mean(y[:m])
        return s - s.mean()
    w = np.ones(m + 1) / m
    w[0] = w[-1] = 0.5 / m
    ma = np.convolve(y, w, mode="valid")
    detr = y[m // 2 : m // 2 + ma.size] - ma
    phases = (np.arange(m // 2, m // 2 + ma.size)) % m
    s = np.array([
        detr[phases == ph].mean() if np.any(phases == ph) else 0.0
        for ph in range(m)
    ])
    return s - s.mean()


def _init_states(y: np.ndarray, m: int, season: int) -> np.ndarray:
    """(lags, n_components) initial-state block (reference ces.py:27-52)."""
    ncomp = 2 + (season == _P) + 2 * (season == _F)
    lags = 1 if season == _N else m
    st = np.zeros((lags, ncomp))
    if season == _N:
        mean_ = float(np.mean(y[: min(max(10, m), y.size)]))
        st[0, 0], st[0, 1] = mean_, mean_ / 1.1
    elif season == _S:
        st[:, 0] = y[:lags]
        st[:, 1] = y[:lags] / 1.1
    else:
        mean_ = float(np.mean(y[:lags]))
        st[:, 0] = mean_
        st[:, 1] = mean_ / 1.1
        st[:, 2] = _classical_seasonal(y, m)
        if season == _F:
            st[:, 3] = st[:, 2] / 1.1
    return st


def _run(y, st0, m, season, a0, a1, b0, b1, h=0, noise=None):
    """Forward CES pass; returns (e, f, final_block, fc) where fc is the
    h-step zero-error (or noise-injected) forecast from the final states."""
    lags = 1 if season == _N else m
    n = y.size
    ncomp = st0.shape[1]
    buf = np.empty((lags + n + max(h, lags), ncomp))
    buf[:lags] = st0
    e = np.empty(n)
    f = np.empty(n)

    def update(i, err):
        j = i - 1 if season != _S else i - lags
        s0, s1 = buf[j, 0], buf[j, 1]
        buf[i, 0] = s0 - (1 - a1) * s1 + (a0 - a1) * err
        buf[i, 1] = s0 + (1 - a0) * s1 + (a0 + a1) * err
        if season == _P:
            buf[i, 2] = buf[i - lags, 2] + b0 * err
        elif season == _F:
            s2, s3 = buf[i - lags, 2], buf[i - lags, 3]
            buf[i, 2] = s2 - (1 - b1) * s3 + (b0 - b1) * err
            buf[i, 3] = s2 + (1 - b0) * s3 + (b0 + b1) * err

    for t in range(n):
        i = lags + t
        if season == _S:
            fi = buf[i - lags, 0]
        else:
            fi = buf[i - 1, 0]
            if season > _S:
                fi += buf[i - lags, 2]
        f[t] = fi
        e[t] = y[t] - fi
        update(i, e[t])

    fc = np.empty(h)
    for k in range(h):
        i = lags + n + k
        if season == _S:
            fi = buf[i - lags, 0]
        else:
            fi = buf[i - 1, 0]
            if season > _S:
                fi += buf[i - lags, 2]
        err = 0.0 if noise is None else noise[k]
        fc[k] = fi + err
        update(i, err)
    return e, f, buf, fc


def ces_fit(y: np.ndarray, m: int, season_str: str, maxiter: int = 600) -> dict | None:
    season = _CODES[season_str]
    m_eff = 1 if season == _N else m
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    ncomp = 2 + (season == _P) + 2 * (season == _F)
    if n <= ncomp + 1 or n < 2 * m_eff:
        return None
    st0 = _init_states(y, m_eff, season)

    # free params per season type (reference initparamces, ces.py:110-190)
    names = ["alpha_0", "alpha_1"]
    x0 = [1.3, 1.0]
    lo_all = {"alpha_0": 0.01, "alpha_1": 0.01, "beta_0": 0.01, "beta_1": 0.01}
    hi_all = {"alpha_0": 1.8, "alpha_1": 1.9, "beta_0": 1.5, "beta_1": 1.5}
    if season == _P:
        names.append("beta_0")
        x0.append(0.1)
    elif season == _F:
        names += ["beta_0", "beta_1"]
        x0 += [1.3, 1.0]
    lo = np.array([lo_all[k] for k in names])
    hi = np.array([hi_all[k] for k in names])

    def params(x):
        d = dict(zip(names, x))
        return (d["alpha_0"], d["alpha_1"], d.get("beta_0", 0.0),
                d.get("beta_1", 0.0))

    def objective(x):
        a0, a1, b0, b1 = params(x)
        e, *_ = _run(y, st0, m_eff, season, a0, a1, b0, b1)
        sse = float(np.dot(e, e))
        if not np.isfinite(sse) or sse <= 0:
            return np.inf
        return n * np.log(sse)

    xb, fb = nelder_mead(objective, np.array(x0), lo, hi,
                         max_iter=maxiter, tol_std=1e-7)
    if not np.isfinite(fb):
        return None
    a0, a1, b0, b1 = params(xb)
    e, f, buf, _ = _run(y, st0, m_eff, season, a0, a1, b0, b1)
    lik = n * np.log(float(np.dot(e, e)))
    np_ = ncomp + 1
    aic = lik + 2 * np_
    aicc = aic + (2 * np_ * (np_ + 1) / (n - np_ - 1) if n - np_ - 1 > 0 else np.inf)
    sigma2 = float(np.dot(e, e)) / max(n - np_ - 1, 1)
    return {"season": season, "m": m_eff, "params": (a0, a1, b0, b1),
            "st0": st0, "fitted": f, "resid": e, "lik": lik, "aic": aic,
            "aicc": aicc, "sigma2": sigma2, "n": n, "seasontype": season_str}


def auto_ces(y: np.ndarray, m: int, model: str = "Z") -> dict:
    """Season-type selection by AICc (reference ces.py:426-491)."""
    y = np.asarray(y, dtype=np.float64)
    if m < 2 or y.size < 2 * m:
        candidates = ["N"]
    elif model == "Z":
        candidates = ["N", "S", "P", "F"]
    else:
        candidates = [model]
    best = None
    for s in candidates:
        fit = ces_fit(y, m, s)
        if fit is None or not np.isfinite(fit["aicc"]):
            continue
        if best is None or fit["aicc"] < best["aicc"]:
            best = fit
    if best is None:
        raise ValueError(f"AutoCES: no CES model fits series of length {y.size}")
    return best


class AutoCES(Model):
    """Complex exponential smoothing with season-type selection
    (reference models.py:1011). Intervals from simulated innovation paths
    (gaussian, seeded — deterministic under any partitioning)."""

    tunable = True

    def __init__(self, season_length: int = 1, model: str = "Z",
                 alias: str | None = None):
        super().__init__(alias or "CES")
        if model not in ("Z", "N", "S", "P", "F"):
            raise ValueError(f"invalid CES model {model!r}")
        self.m = max(int(season_length), 1)
        self.model = model

    def _forecast(self, y, h, fitted):
        fit = auto_ces(y, self.m, self.model)
        a0, a1, b0, b1 = fit["params"]
        yy = np.asarray(y, dtype=np.float64)
        _, _, _, mean = _run(yy, fit["st0"], fit["m"], fit["season"],
                             a0, a1, b0, b1, h=h)
        # sigma via simulated zero-mean innovation paths through the recursion
        rng = np.random.RandomState(1)
        scale = np.sqrt(max(fit["sigma2"], 1e-300))
        paths = np.empty((200, h))
        for p in range(paths.shape[0]):
            noise = rng.normal(0.0, scale, h)
            _, _, _, fc = _run(yy, fit["st0"], fit["m"], fit["season"],
                               a0, a1, b0, b1, h=h, noise=noise)
            paths[p] = fc
        sigmah = paths.std(axis=0)
        return mean, sigmah, fit["fitted"]
