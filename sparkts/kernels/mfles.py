"""MFLES — gradient-boosted time-series decomposition.

Semantics re-derived from the reference (reference mfles.py:282-668; model
classes models.py:1577 AutoMFLES, models.py:6149 MFLES): a boosting loop
over component fits —

* init: (moving) median level; z-score normalize (or log when
  multiplicative: seasonal & strictly positive, mfles.py:360-373);
* alternating rounds: fourier-basis OLS seasonality (order 5/10/15 by
  period, shrunk by ``seasonal_lr``), linear trend (plain OLS on round 1,
  changepoint-basis lasso after; Siegel repeated medians when robust),
  SES-ensemble residual smoothing (avg of exponentially-weighted means over
  an alpha ladder, or a moving average);
* each component is kept only if it lowers the in-sample MSE; boosting
  stops after 6 non-improving rounds; extreme outliers capped after round 1;
* predict: trend continues at the last boosted slope, damped by the trend
  R² penalty (mfles.py:564-583); seasonality tiles; everything denormalized.

Deviations (documented): the reference's changepoint basis is a C++ routine
(_mfles.get_basis) and its lasso is sklearn's; here the basis is the
standard hinge (piecewise-linear) changepoint design and the lasso is
coordinate descent — both published formulations; future-basis continuation
is exact for hinges. Intervals via conformal scores like the reference
(AutoMFLES uses only_conformal_intervals) or residual-sigma gaussian.
"""

from __future__ import annotations

import numpy as np

from sparkts.kernels.base import Model, residual_sigma


# --------------------------------------------------------------------- #
# helpers (reference mfles.py:119-280)
# --------------------------------------------------------------------- #

def set_fourier(period: int) -> int:
    if period < 10:
        return 5
    if period < 70:
        return 10
    return 15


def get_fourier_series(length: int, period: int, order: int) -> np.ndarray:
    t = np.arange(length, dtype=np.float64)
    k = np.arange(1, order + 1, dtype=np.float64)
    ang = 2 * np.pi * np.outer(t, k) / period
    return np.hstack([np.sin(ang), np.cos(ang)])


def median_init(y: np.ndarray, period: int | None) -> np.ndarray:
    if period is None:
        return np.full_like(y, np.median(y))
    full, resid = divmod(y.size, period)
    meds = np.median(y[: full * period].reshape(full, period), axis=1)
    out = np.repeat(meds, period)
    if resid:
        out = np.append(out, np.repeat(np.median(y[-period:]), resid))
    return out


def fast_ols(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    m = x.size
    xs, ys = x.sum(), y.sum()
    denom = m * (x @ x) - xs**2
    slope = (m * (x @ y) - xs * ys) / denom if denom else 0.0
    return slope * x + (ys - slope * xs) / m


def ols_fit(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    return X @ (np.linalg.pinv(X.T @ X) @ (X.T @ y))


def wls_fit(X: np.ndarray, y: np.ndarray, w: np.ndarray) -> np.ndarray:
    Xw = X.T * w
    return X @ (np.linalg.pinv(Xw @ X) @ (Xw @ y))


def cap_outliers(series: np.ndarray, cap: float = 3.0) -> np.ndarray:
    mu, sd = np.mean(series), np.std(series)
    return np.clip(series, mu - cap * sd, mu + cap * sd)


def ewm_mean(y: np.ndarray, alpha: float) -> np.ndarray:
    out = np.empty_like(y)
    acc = y[0]
    out[0] = acc
    for i in range(1, y.size):
        acc = alpha * y[i] + (1 - alpha) * acc
        out[i] = acc
    return out


def ses_ensemble(y, min_alpha=0.05, max_alpha=1.0, smooth=False, order=1):
    if smooth:
        alphas = np.arange(min_alpha, max_alpha, 0.05)
        out = np.zeros_like(y)
        for a in alphas:
            out += ewm_mean(y, a)
        return out / len(alphas)
    k = order + 1
    out = np.convolve(y, np.ones(k) / k, mode="full")[: y.size]
    out[:k] = y[:k]
    return out


def siegel_repeated_medians(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Siegel's repeated-median line (published robust regression)."""
    n = x.size
    slopes = np.empty(n)
    for i in range(n):
        dx = x - x[i]
        dy = y - y[i]
        mask = dx != 0
        slopes[i] = np.median(dy[mask] / dx[mask]) if mask.any() else 0.0
    slope = float(np.median(slopes))
    intercept = float(np.median(y - slope * x))
    return slope * x + intercept


def hinge_basis(n: int, n_changepoints: int) -> np.ndarray:
    """[t, max(0, t−c_k)] changepoint design, knots at interior quantiles."""
    t = np.arange(n, dtype=np.float64)
    cols = [t / n]
    if n_changepoints > 0:
        knots = np.linspace(0, n, n_changepoints + 2)[1:-1]
        for c in knots:
            cols.append(np.maximum(0.0, t - c) / n)
    return np.column_stack(cols)


def lasso_cd(X, y, alpha, tol=1e-4, maxiter=1000):
    """Coordinate-descent lasso (no intercept), standard soft-thresholding."""
    n, p = X.shape
    beta = np.zeros(p)
    col_sq = (X * X).sum(axis=0)
    col_sq[col_sq == 0] = 1.0
    r = y - X @ beta
    for _ in range(maxiter):
        max_delta = 0.0
        for j in range(p):
            bj = beta[j]
            rho = X[:, j] @ r + col_sq[j] * bj
            new = np.sign(rho) * max(abs(rho) - alpha * n, 0.0) / col_sq[j]
            if new != bj:
                r += X[:, j] * (bj - new)
                max_delta = max(max_delta, abs(new - bj))
                beta[j] = new
        if max_delta < tol:
            break
    return beta


def _mse(a, b):
    return float(np.mean((a - b) ** 2))


# --------------------------------------------------------------------- #
# the boosted model
# --------------------------------------------------------------------- #

class MFLESCore:
    """fit/predict pair holding the boosted components."""

    def __init__(self, robust: bool | None = None):
        self.robust = robust
        self.penalty = None

    def fit(self, y, seasonal_period=None, fourier_order=None, ma=None,
            alpha=1.0, n_changepoints=0.25, seasonal_lr=0.9, rs_lr=1.0,
            linear_lr=0.9, cov_threshold=0.7, moving_medians=False,
            max_rounds=50, min_alpha=0.05, max_alpha=1.0,
            round_penalty=1e-4, trend_penalty=True, multiplicative=None,
            changepoints=True, smoother=False, seasonality_weights=False):
        y = np.asarray(y, dtype=np.float64)
        n = y.size
        periods = None
        if seasonal_period is not None:
            periods = ([int(seasonal_period)] if np.isscalar(seasonal_period)
                       else [int(p) for p in seasonal_period])
            periods = [p for p in periods if 1 < p < n]
            if not periods:
                periods = None
        if multiplicative is None:
            multiplicative = periods is not None and y.min() > 0
        if multiplicative and y.min() <= 0:
            multiplicative = False
        multiplicative = bool(multiplicative)
        self.multiplicative = multiplicative
        if multiplicative:
            self.mean, self.std = 0.0, 1.0
            z = np.log(y)
        else:
            self.mean = float(np.mean(y))
            self.std = float(np.std(y)) or 1.0
            z = (y - self.mean) / self.std
        if n < 4 or np.all(z == z[0]):
            self.trend = np.array([z[-1], z[-1]])
            self.seasonality = None
            self.penalty = 0.0
            self.fitted_z = np.full(n, z[-1])
            return self._denorm(self.fitted_z)

        if isinstance(n_changepoints, float) and n_changepoints < 1:
            n_changepoints = int(n_changepoints * n)
        fitted = (median_init(z, max(periods)) if moving_medians and periods
                  else median_init(z, None))
        self.trend = np.array([fitted[-1], fitted[-1]])
        self.seasonality = np.zeros(max(periods)) if periods else None
        fourier = {}
        if periods:
            for p in periods:
                order = fourier_order or set_fourier(p)
                fourier[p] = get_fourier_series(n, p, order)
        mse = None
        equal = 0
        pcycle = 0
        for i in range(max_rounds):
            resids = z - fitted
            cur = _mse(z, fitted)
            if mse is None:
                mse = cur
            elif mse <= cur:
                if equal == 6:
                    break
                equal += 1
            else:
                mse = cur
            if periods:
                p = periods[pcycle % len(periods)]
                pcycle += 1
                if seasonality_weights:
                    w = np.ones(n)
                    w[-3 * p:] = 2.0  # recent cycles weigh double
                    seas = wls_fit(fourier[p], resids, w)
                else:
                    seas = ols_fit(fourier[p], resids)
                seas = seas * seasonal_lr
                if mse > _mse(z, fitted + seas):
                    mse = _mse(z, fitted + seas)
                    fitted = fitted + seas
                    resids = z - fitted
                    self.seasonality += np.resize(seas[-p:], self.seasonality.size)
            if i % 2:  # odd round: linear/trend piece
                if self.robust:
                    tren = siegel_repeated_medians(
                        np.arange(n, dtype=np.float64), resids)
                elif i == 1 or not changepoints:
                    tren = fast_ols(np.arange(n, dtype=np.float64), resids)
                else:
                    cps = min(int(n_changepoints), int(0.1 * n))
                    B = hinge_basis(n, cps)
                    tren = (B @ lasso_cd(B, resids, alpha)) * linear_lr
                if mse > _mse(z, fitted + tren):
                    mse = _mse(z, fitted + tren)
                    fitted = fitted + tren
                    self.trend = self.trend + tren[-2:]
                    if i == 1:
                        denom = float(np.var(resids)) or 1.0
                        self.penalty = max(
                            0.0, 1 - float(np.var(resids - tren)) / denom)
            elif i > 4:  # even round > 4: residual smoothing
                tren = ses_ensemble(resids, min_alpha, max_alpha,
                                    smooth=bool(smoother), order=int(ma or 1)) * rs_lr
                if mse > _mse(z, fitted + tren) + round_penalty * mse:
                    mse = _mse(z, fitted + tren)
                    fitted = fitted + tren
                    self.trend = self.trend + tren[-1]
            if i == 0 and self.robust is None:
                cov = (float(np.std(resids) / np.mean(resids))
                       if np.mean(resids) else np.inf)
                self.robust = abs(cov) > cov_threshold
            if i == 1:
                resids = cap_outliers(resids, 5)
        self.trend_penalty = trend_penalty
        self.fitted_z = fitted
        return self._denorm(fitted)

    def _denorm(self, z):
        if self.multiplicative:
            return np.exp(z)
        return self.mean + z * self.std

    def predict(self, h):
        last = self.trend[1]
        slope = self.trend[1] - self.trend[0]
        if getattr(self, "trend_penalty", False) and self.penalty is not None:
            slope *= max(0.0, self.penalty)
        pred = last + slope * np.arange(1, h + 1)
        if self.seasonality is not None:
            pred = pred + np.resize(self.seasonality, h)
        return self._denorm(pred)


class MFLES(Model):
    """Fixed-config MFLES (reference models.py:6149)."""

    tunable = True

    def __init__(self, season_length: int | list[int] | None = None,
                 robust: bool | None = None, alias: str | None = None,
                 **fit_kwargs):
        super().__init__(alias or "MFLES")
        self.season_length = season_length
        self.robust = robust
        self.fit_kwargs = fit_kwargs

    def _forecast(self, y, h, fitted):
        core = MFLESCore(robust=self.robust)
        fitted_vals = core.fit(y, seasonal_period=self.season_length,
                               **self.fit_kwargs)
        mean = core.predict(h)
        resid = np.asarray(y, dtype=np.float64) - fitted_vals
        sigma = residual_sigma(resid, max(len(y) - 1, 1))
        return mean, np.full(h, sigma), fitted_vals

    # ---- forward contract: MFLES's one config-level data-dependent choice
    # is the auto-detected robust flag; forward pins it and re-fits the
    # boosting rounds on the new data (the component fits are the model
    # itself, like MSTL's decomposition — not tuned hyper-parameters).
    def fit_state(self, y, X=None):
        core = MFLESCore(robust=self.robust)
        core.fit(np.asarray(y, dtype=np.float64),
                 seasonal_period=self.season_length, **self.fit_kwargs)
        return {"robust": bool(core.robust)}

    def forward(self, state, y, h, level=None, fitted=False,
                X=None, X_future=None):
        from sparkts.kernels.base import add_intervals

        y = np.asarray(y, dtype=np.float64)
        core = MFLESCore(robust=state["robust"])
        fitted_vals = core.fit(y, seasonal_period=self.season_length,
                               **self.fit_kwargs)
        res = {"mean": core.predict(h)}
        if fitted:
            res["fitted"] = fitted_vals
        if level:
            sigma = residual_sigma(y - fitted_vals, max(y.size - 1, 1))
            add_intervals(res, np.full(h, sigma), level)
        return res


class AutoMFLES(Model):
    """Config search by rolling-origin CV (reference models.py:1577,
    mfles.py:585-640 optimize + default_configs)."""

    tunable = True

    def __init__(self, season_length: int | list[int] | None = None,
                 test_size: int | None = None, n_windows: int = 2,
                 metric: str = "smape", alias: str | None = None):
        super().__init__(alias or "AutoMFLES")
        self.season_length = season_length
        self.test_size = test_size
        self.n_windows = n_windows
        self.metric = metric

    def _configs(self):
        sp = self.season_length
        if sp is not None:
            sp_list = [sp] if np.isscalar(sp) else list(sp)
            grid = [
                {"seasonality_weights": sw, "smoother": sm, "ma": ma,
                 "seasonal_period": spv}
                for sw in (True, False)
                for sm in (True, False)
                for ma in (int(min(sp_list)), max(int(min(sp_list) / 2), 1), None)
                for spv in (None, sp_list)
            ]
        else:
            grid = [
                {"smoother": sm, "cov_threshold": ct, "max_rounds": mr,
                 "seasonal_period": None}
                for sm in (True, False)
                for ct in (0.5, 10000)
                for mr in (5, 20)
            ]
        return grid

    def _score(self, actual, pred):
        actual, pred = np.asarray(actual), np.asarray(pred)
        if self.metric == "smape":
            denom = np.abs(actual) + np.abs(pred)
            denom[denom == 0] = 1.0
            return float(np.mean(2 * np.abs(actual - pred) / denom))
        if self.metric == "mae":
            return float(np.mean(np.abs(actual - pred)))
        return float(np.mean((actual - pred) ** 2))

    def _cv_err(self, y, test_size, cfg, robust=None):
        """Rolling-origin cv criterion of one config (the selection metric)."""
        max_windows = max(min(self.n_windows, (y.size - 4) // test_size - 1), 1)
        errs = []
        for w in range(max_windows):
            cut = y.size - (max_windows - w) * test_size
            if cut < 4:
                raise ValueError("series too short for cv window")
            core = MFLESCore(robust=robust)
            core.fit(y[:cut], **cfg)
            errs.append(self._score(y[cut:cut + test_size],
                                    core.predict(test_size)))
        return float(np.mean(errs)) if errs else np.inf

    def _select(self, y, h):
        """(best config, its cv error) by rolling-origin CV."""
        test_size = self.test_size or h
        best_cfg, best_err = None, np.inf
        for cfg in self._configs():
            try:
                err = self._cv_err(y, test_size, cfg)
            except Exception:
                continue
            if err < best_err:
                best_err, best_cfg = err, cfg
        if best_cfg is None:
            best_cfg = {"seasonal_period": self.season_length}
        return best_cfg, best_err

    def _forecast(self, y, h, fitted):
        y = np.asarray(y, dtype=np.float64)
        best_cfg, _ = self._select(y, h)
        core = MFLESCore()
        fitted_vals = core.fit(y, **best_cfg)
        mean = core.predict(h)
        sigma = residual_sigma(y - fitted_vals, max(y.size - 1, 1))
        return mean, np.full(h, sigma), fitted_vals

    # ---- forward contract: the cv config search is the tuned state;
    # forward pins the winning config and re-fits MFLES on the new data
    # with it (no search). ``h`` at fit time defaults the cv test_size, so
    # fit_state uses test_size or 1 — pass test_size explicitly for parity.
    def fit_state(self, y, X=None):
        y = np.asarray(y, dtype=np.float64)
        cfg, _ = self._select(y, self.test_size or 1)
        core = MFLESCore()
        core.fit(y, **cfg)
        return {"cfg": dict(cfg), "robust": bool(core.robust)}

    def forward(self, state, y, h, level=None, fitted=False,
                X=None, X_future=None):
        from sparkts.kernels.base import add_intervals

        y = np.asarray(y, dtype=np.float64)
        core = MFLESCore(robust=state["robust"])
        fitted_vals = core.fit(y, **state["cfg"])
        res = {"mean": core.predict(h)}
        if fitted:
            res["fitted"] = fitted_vals
        if level:
            sigma = residual_sigma(y - fitted_vals, max(y.size - 1, 1))
            add_intervals(res, np.full(h, sigma), level)
        return res
