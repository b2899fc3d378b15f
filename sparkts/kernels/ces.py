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

Round 2: the reference's BACKFIT refinement (src/ces.cpp:218-278 — forward
→ reverse → forward passes that re-derive both ends' initial states) is now
implemented in _ces_calc; the nonseasonal state/forecast trajectories match
the reference's R-derived goldens to 4 decimals (tests/test_goldens.py).
Intervals: h-step sigma from dispersion of simulated gaussian innovation
paths rolled out from the final states (the reference also simulates;
ces.py:416-424).
"""

from __future__ import annotations

import numpy as np

from sparkts.kernels.base import Model, add_intervals
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


def _ces_update(buf, i, m_eff, season, a0, a1, b0, b1, y_i):
    """One state transition given observation y_i (reference src/ces.cpp:37
    cesupdate): the error is computed against the CURRENT one-step forecast,
    then the complex pair (and seasonal components) roll forward."""
    if season == _S:
        e = y_i - buf[i - m_eff, 0]
    else:
        e = y_i - buf[i - 1, 0]
    if season > _S:
        e -= buf[i - m_eff, 2]
    j = i - m_eff if season == _S else i - 1
    s0, s1 = buf[j, 0], buf[j, 1]
    buf[i, 0] = s0 - (1 - a1) * s1 + (a0 - a1) * e
    buf[i, 1] = s0 + (1 - a0) * s1 + (a0 + a1) * e
    if season == _P:
        buf[i, 2] = buf[i - m_eff, 2] + b0 * e
    elif season == _F:
        s2, s3 = buf[i - m_eff, 2], buf[i - m_eff, 3]
        buf[i, 2] = s2 - (1 - b1) * s3 + (b0 - b1) * e
        buf[i, 3] = s2 + (1 - b0) * s3 + (b0 + b1) * e


def _ces_fcst(states, i, m_eff, season, h, a0, a1, b0, b1, noise=None):
    """h-step rollout from row i (reference cesfcst_buf): the observation
    fed back is the forecast itself (plus optional innovation noise), so the
    internal error is zero (or the injected noise). Returns (f, tmp) where
    tmp rows m_eff.. hold the propagated future states."""
    ncomp = states.shape[1]
    tmp = np.zeros((m_eff + h, ncomp))
    tmp[:m_eff] = states[i - m_eff: i]
    f = np.empty(h)
    for ih in range(m_eff, m_eff + h):
        if season == _S:
            fi = tmp[ih - m_eff, 0]
        else:
            fi = tmp[ih - 1, 0]
        if season > _S:
            fi += tmp[ih - m_eff, 2]
        if noise is not None:
            fi += noise[ih - m_eff]
        f[ih - m_eff] = fi
        _ces_update(tmp, ih, m_eff, season, a0, a1, b0, b1, fi)
    return f, tmp


def _ces_calc(y, st0, m_eff, season, a0, a1, b0, b1, nmse=3, backfit=True):
    """Full CES filter with the reference's BACKFIT refinement
    (src/ces.cpp:218-278 cescalc): forward pass → reverse y/states →
    backward pass → forward pass again, each pass re-deriving the opposite
    end's initial states from the trailing forecast states. Returns
    (lik, e, amse, buf) with lik = n·log Σe² of the final pass and buf the
    (m_eff + n + m_eff)-row state matrix in forward orientation."""
    n = y.size
    ncomp = st0.shape[1]
    buf = np.zeros((n + 2 * m_eff, ncomp))
    buf[:m_eff] = st0
    e = np.full(n, np.nan)
    amse = np.zeros(nmse)
    denom = np.zeros(nmse)

    def one_pass(yv):
        # one-step forecast computed inline (same arithmetic as
        # _ces_fcst's first iteration); the multi-step AMSE rollout the
        # old code ran per observation had no consumer — CES selection is
        # by likelihood/AICc only — and dominated the AutoCES profile
        lik = 0.0
        for t in range(n):
            i = m_eff + t
            if season == _S:
                f0 = buf[i - m_eff, 0]
            else:
                f0 = buf[i - 1, 0]
            if season > _S:
                f0 += buf[i - m_eff, 2]
            e[t] = yv[t] - f0
            _ces_update(buf, i, m_eff, season, a0, a1, b0, b1, yv[t])
            lik += e[t] * e[t]
        return lik

    def update_trailing():
        _, tmp = _ces_fcst(buf, n + m_eff, m_eff, season, m_eff,
                           a0, a1, b0, b1)
        buf[n + m_eff:] = tmp[m_eff:]

    lik = one_pass(y)
    if not np.isfinite(lik):
        return np.inf, e, amse, buf
    update_trailing()
    if backfit:
        y_rev = y[::-1].copy()
        buf[:] = buf[::-1]
        lik = one_pass(y_rev)
        if not np.isfinite(lik):
            return np.inf, e, amse, buf
        update_trailing()
        buf[:] = buf[::-1]
        lik = one_pass(y)
        if not np.isfinite(lik):
            return np.inf, e, amse, buf
        update_trailing()
    return n * np.log(lik) if lik > 0 else -np.inf, e, amse, buf


def ces_fit(y: np.ndarray, m: int, season_str: str, maxiter: int = 600,
            fixed: dict | None = None) -> dict | None:
    season = _CODES[season_str]
    m_eff = 1 if season == _N else m
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    ncomp = 2 + (season == _P) + 2 * (season == _F)
    if n <= ncomp + 1 or n < 2 * m_eff:
        return None
    st0 = _init_states(y, m, season)  # reference passes the SEASON length even for N (idx = min(max(10, m), n))

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
        lik, *_ = _ces_calc(y, st0, m_eff, season, a0, a1, b0, b1)
        return lik if np.isfinite(lik) else np.inf

    fixed = dict(fixed or {})
    unknown = set(fixed) - set(names)
    if unknown:
        raise ValueError(f"fixed refers to unknown CES parameters "
                         f"{sorted(unknown)}; valid: {names}")
    x0 = np.array([fixed.get(nm, v) for nm, v in zip(names, x0)])
    free = np.array([nm not in fixed for nm in names])
    if not free.any():
        # fully pinned: one deterministic backfit filter pass — how the
        # driver's recursive-CTE SQL oracle drives the recursion
        xb, fb = x0, objective(x0)
    else:
        def objective_free(xf):
            x = x0.copy()
            x[free] = xf
            return objective(x)

        xf, fb = nelder_mead(objective_free, x0[free], lo[free], hi[free],
                             max_iter=maxiter, tol_std=1e-7)
        xb = x0.copy()
        xb[free] = xf
    if not np.isfinite(fb):
        return None
    a0, a1, b0, b1 = params(xb)
    lik, e, amse, buf = _ces_calc(y, st0, m_eff, season, a0, a1, b0, b1)
    if not np.isfinite(lik):
        return None
    f = y - e
    np_ = ncomp + 1
    aic = lik + 2 * np_
    aicc = aic + (2 * np_ * (np_ + 1) / (n - np_ - 1) if n - np_ - 1 > 0 else np.inf)
    sigma2 = float(np.dot(e, e)) / max(n - np_ - 1, 1)
    return {"season": season, "m": m_eff, "params": (a0, a1, b0, b1),
            "st0": st0, "states": buf, "fitted": f, "resid": e, "lik": lik,
            "aic": aic, "aicc": aicc, "sigma2": sigma2, "n": n,
            "seasontype": season_str}


def auto_ces(y: np.ndarray, m: int, model: str = "Z",
             fixed: dict | None = None) -> dict:
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
        fit = ces_fit(y, m, s, fixed=fixed)
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
                 fixed_params: dict | None = None, alias: str | None = None):
        super().__init__(alias or "CES")
        if model not in ("Z", "N", "S", "P", "F"):
            raise ValueError(f"invalid CES model {model!r}")
        self.m = max(int(season_length), 1)
        self.model = model
        #: pinned smoothing parameters (alpha_0 / alpha_1 / beta_0 / beta_1)
        self.fixed_params = dict(fixed_params) if fixed_params else None

    @staticmethod
    def _fc_from_fit(fit, h):
        a0, a1, b0, b1 = fit["params"]
        buf, m_eff, season = fit["states"], fit["m"], fit["season"]
        n = fit["n"]
        mean, _ = _ces_fcst(buf, n + m_eff, m_eff, season, h, a0, a1, b0, b1)
        # sigma via simulated innovation paths rolled out from the FINAL
        # states (the fit is shared; only the future innovations vary)
        rng = np.random.RandomState(1)
        scale = np.sqrt(max(fit["sigma2"], 1e-300))
        paths = np.empty((200, h))
        for p in range(paths.shape[0]):
            noise = rng.normal(0.0, scale, h)
            paths[p], _ = _ces_fcst(buf, n + m_eff, m_eff, season, h,
                                    a0, a1, b0, b1, noise=noise)
        sigmah = paths.std(axis=0)
        return mean, sigmah, fit["fitted"]

    def _forecast(self, y, h, fitted):
        fit = auto_ces(y, self.m, self.model, fixed=self.fixed_params)
        return self._fc_from_fit(fit, h)

    # ---- forward contract (reference forward_ces, ces.py:492-508) --------
    _PARAM_NAMES = ("alpha_0", "alpha_1", "beta_0", "beta_1")

    def fit_state(self, y, X=None):
        """Reusable state: the SELECTED season type + its optimized
        smoothing parameters (only the ones that season type has)."""
        fit = auto_ces(np.asarray(y, dtype=np.float64), self.m, self.model,
                       fixed=self.fixed_params)
        nfree = {"N": 2, "S": 2, "P": 3, "F": 4}[fit["seasontype"]]
        vals = dict(zip(self._PARAM_NAMES, fit["params"]))
        return {"seasontype": fit["seasontype"],
                "fixed": {nm: vals[nm] for nm in self._PARAM_NAMES[:nfree]}}

    def forward(self, state, y, h, level=None, fitted=False,
                X=None, X_future=None):
        """Re-run the CES backfit filter on the new data with the fitted
        season type and smoothing parameters pinned (reference forward_ces,
        ces.py:492-508): initial states re-derived from the new series,
        zero optimizer calls."""
        fit = auto_ces(np.asarray(y, dtype=np.float64), self.m,
                       model=state["seasontype"], fixed=state["fixed"])
        mean, sigmah, fitted_vals = self._fc_from_fit(fit, h)
        res = {"mean": mean}
        if fitted:
            res["fitted"] = fitted_vals
        if level:
            add_intervals(res, sigmah, level)
        return res
