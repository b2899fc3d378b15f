"""GARCH / ARCH volatility models.

Semantics re-derived from the reference (reference garch.py:47-134, C++
recursion src/garch.cpp:14-90): sigma²_t = w + Σαᵢ y²_{t-i} + Σβⱼ σ²_{t-j},
slots before max(p,q) seeded with the unconditional variance; gaussian
negative log-likelihood on the de-meaned series; constraint Σα+Σβ < 1.
The reference optimizes with SLSQP; scipy is unavailable here, so the same
objective runs under box-bounded Nelder-Mead with a penalty for the
stationarity constraint — identical feasible region, same minima on the
reference's well-conditioned test problems.

Forecast semantics mirror the reference exactly, including the seeded
np.random draws (garch_forecast seeds np.random.seed(1) and emits
ε·√σ̂² paths — deterministic by construction, partition-independent).
"""

from __future__ import annotations

import numpy as np

from sparkts.kernels.base import Model, add_intervals, norm_ppf


def _sigma2_path(params, y, p, q):
    w = params[0]
    alpha = params[1 : p + 1]
    beta = params[p + 1 : p + 1 + q]
    n = y.size
    start = max(p, q)
    sigma2 = np.empty(n)
    sigma2[:start] = np.var(y - np.nanmean(y))
    for k in range(start, n):
        s = w + float(np.dot(alpha[::-1], y[k - p : k] ** 2)) if p else w
        if q:
            s += float(np.dot(beta[::-1], sigma2[k - q : k]))
        sigma2[k] = s
    return sigma2


def _neg_loglik(params, y, p, q):
    if np.sum(params[1:]) >= 1.0:  # stationarity (src/garch.cpp:90)
        return np.inf
    sigma2 = _sigma2_path(params, y, p, q)
    start = max(p, q)
    s2 = np.maximum(sigma2[start:], 1e-10)
    z = y[start:] - np.nanmean(y)
    return 0.5 * float(np.sum(np.log(2 * np.pi) + np.log(s2) + z * z / s2))


def garch_fit(y: np.ndarray, p: int, q: int,
              fixed_coeff: np.ndarray | None = None) -> dict:
    from sparkts.kernels.optim import nelder_mead

    y = np.asarray(y, dtype=np.float64)
    if fixed_coeff is not None:
        # pinned (w, α₁..αp, β₁..βq): skip the MLE, run the filter only —
        # one deterministic pass, which is what the driver's recursive-CTE
        # SQL oracle replays
        coeff = np.asarray(fixed_coeff, dtype=np.float64)
        if coeff.size != 1 + p + q:
            raise ValueError(
                f"fixed_coeff needs 1+p+q={1 + p + q} values, got {coeff.size}")
    else:
        nparams = 1 + p + q
        x0 = np.full(nparams, 0.1)  # reference garch.py:64
        lo = np.full(nparams, 1e-8)
        hi = np.full(nparams, 10.0)
        hi[1:] = 1.0
        # Nelder-Mead with restarts: the GARCH likelihood has a w↔β ridge
        # that a single simplex can stall on; re-seeding the simplex at the
        # incumbent is the standard remedy (reference reaches the same point
        # via SLSQP).
        obj = lambda x: _neg_loglik(x, y, p, q)  # noqa: E731
        coeff, fbest = nelder_mead(obj, x0, lo, hi, max_iter=2000,
                                   tol_std=1e-10)
        for _ in range(4):
            cand, fcand = nelder_mead(obj, coeff, lo, hi, max_iter=2000,
                                      tol_std=1e-10, init_step=0.5)
            if fcand >= fbest - 1e-10:
                break
            coeff, fbest = cand, fcand
    sigma2 = _sigma2_path(coeff, y, p, q)
    # fitted path: seeded noise × conditional vol (reference garch.py:83-89)
    rng = np.random.RandomState(1)
    fitted = np.full(y.size, np.nan)
    for k in range(p, y.size):
        fitted[k] = rng.randn() * np.sqrt(sigma2[k])
    return {
        "p": p, "q": q, "coeff": coeff,
        "y_vals": y[-p:] if p else np.empty(0),
        "sigma2_vals": sigma2[-q:] if q else np.empty(0),
        "fitted": fitted,
    }


def garch_forecast(mod: dict, h: int) -> dict:
    """h-step simulated path + sigma2 recursion (reference garch.py:103-134,
    incl. the seed-1 noise sequence)."""
    rng = np.random.RandomState(1)
    p, q = mod["p"], mod["q"]
    w = mod["coeff"][0]
    alpha = mod["coeff"][1 : p + 1]
    beta = mod["coeff"][p + 1 :]
    y_vals = np.full(h + p, np.nan)
    s2_vals = np.full(h + q, np.nan)
    y_vals[:p] = mod["y_vals"]
    if q:
        s2_vals[:q] = mod["sigma2_vals"]
    for k in range(h):
        eps = rng.normal(0, 1)
        s2 = w + float(np.nansum(alpha[::-1] * y_vals[k : p + k] ** 2))
        if q:
            s2 += float(np.nansum(beta[::-1] * s2_vals[k : q + k]))
        y_vals[p + k] = eps * np.sqrt(s2)
        s2_vals[q + k] = s2
    return {"mean": y_vals[-h:], "sigma2": s2_vals[-h:], "fitted": mod["fitted"]}


class GARCH(Model):
    """GARCH(p,q) (reference models.py:6550)."""

    tunable = True

    def __init__(self, p: int = 1, q: int = 1,
                 fixed_coeff: list | None = None, alias: str | None = None):
        super().__init__(alias or (f"GARCH({p},{q})" if q else f"ARCH({p})"))
        if p <= 0:
            raise ValueError("p must be > 0")
        self.p, self.q = p, q
        #: pinned (w, α₁..αp, β₁..βq) — skips the MLE entirely
        self.fixed_coeff = (np.asarray(fixed_coeff, dtype=np.float64)
                            if fixed_coeff is not None else None)

    def _forecast(self, y, h, fitted):
        mod = garch_fit(y, self.p, self.q, fixed_coeff=self.fixed_coeff)
        fc = garch_forecast(mod, h)
        sigmah = np.sqrt(np.maximum(fc["sigma2"], 0.0))
        return fc["mean"], sigmah, fc["fitted"] if fitted else None

    # ---- forward contract: the MLE coefficients are the tuned state; the
    # reference has no GARCH forward (cv refit=False raises there) — here
    # forward re-runs the deterministic σ² filter on the new data with the
    # fitted (w, α, β) pinned, which is the standard GARCH re-application.
    def fit_state(self, y, X=None):
        mod = garch_fit(np.asarray(y, dtype=np.float64), self.p, self.q,
                        fixed_coeff=self.fixed_coeff)
        return {"coeff": np.asarray(mod["coeff"], dtype=np.float64)}

    def forward(self, state, y, h, level=None, fitted=False,
                X=None, X_future=None):
        mod = garch_fit(np.asarray(y, dtype=np.float64), self.p, self.q,
                        fixed_coeff=state["coeff"])
        fc = garch_forecast(mod, h)
        res = {"mean": fc["mean"]}
        if fitted:
            res["fitted"] = fc["fitted"]
        if level:
            add_intervals(res, np.sqrt(np.maximum(fc["sigma2"], 0.0)), level)
        return res


class ARCH(GARCH):
    """ARCH(p) = GARCH(p,0) (reference models.py:6721)."""

    def __init__(self, p: int = 1, alias: str | None = None):
        super().__init__(p, 0, alias=alias or f"ARCH({p})")
