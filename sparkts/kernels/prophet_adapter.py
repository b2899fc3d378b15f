"""AutoARIMAProphet — Prophet-API facade over AutoARIMA.

The reference's adapter (reference adapters/prophet.py:34-262) subclasses
Prophet so existing Prophet pipelines can swap in AutoARIMA: it keeps
Prophet's dataframe surface (``fit(df[ds,y])``, ``make_future_dataframe``,
``predict -> ds/yhat/yhat_lower/yhat_upper``) and converts holidays +
extra regressors into exogenous columns. The prophet package is not
installed in this environment, so this facade implements the same surface
standalone (no prophet import) — which is all the reference uses prophet
for anyway (API + holiday feature construction).

Exogenous handling: the reference passes xreg into auto_arima; this
engine's ARIMA is CSS-without-xreg, so the adapter uses the standard
two-step regression-with-ARIMA-errors decomposition: OLS of y on the
regressor matrix, AutoARIMA on the OLS residuals, forecasts added back.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sparkts.kernels.arima import AutoARIMA
from sparkts.kernels.base import norm_ppf


class AutoARIMAProphet:
    """Prophet-shaped wrapper (reference adapters/prophet.py:34)."""

    def __init__(self, season_length: int = 1, holidays: pd.DataFrame | None = None,
                 interval_width: float = 0.80, **auto_arima_kwargs):
        self.m = season_length
        self.holidays = holidays
        self.interval_width = interval_width
        self.extra_regressors: list[str] = []
        self.model = AutoARIMA(season_length=season_length, **auto_arima_kwargs)
        self.history: pd.DataFrame | None = None
        self._beta: np.ndarray | None = None

    # -- Prophet API surface ------------------------------------------- #
    def add_regressor(self, name: str) -> "AutoARIMAProphet":
        self.extra_regressors.append(name)
        return self

    def _holiday_features(self, ds: pd.Series) -> pd.DataFrame:
        """One binary column per holiday name (Prophet's encoding)."""
        out = pd.DataFrame(index=ds.index)
        if self.holidays is None:
            return out
        dates = pd.to_datetime(ds).dt.normalize()
        for name, grp in self.holidays.groupby("holiday"):
            hol = pd.to_datetime(grp["ds"]).dt.normalize()
            out[f"holiday_{name}"] = dates.isin(set(hol)).astype(float)
        return out

    def _design(self, df: pd.DataFrame) -> np.ndarray:
        feats = [self._holiday_features(df["ds"])]
        for r in self.extra_regressors:
            feats.append(df[[r]].astype(float))
        X = pd.concat(feats, axis=1)
        return X.to_numpy(dtype=np.float64) if X.shape[1] else np.zeros((len(df), 0))

    def fit(self, df: pd.DataFrame) -> "AutoARIMAProphet":
        df = df.sort_values("ds").reset_index(drop=True)
        self.history = df
        y = df["y"].to_numpy(dtype=np.float64)
        X = self._design(df)
        if X.shape[1]:
            A = np.hstack([np.ones((len(df), 1)), X])
            self._beta, *_ = np.linalg.lstsq(A, y, rcond=None)
            self._resid_y = y - A @ self._beta
        else:
            self._beta = None
            self._resid_y = y
        return self

    def make_future_dataframe(self, periods: int, freq: str = "D",
                              include_history: bool = False) -> pd.DataFrame:
        last = pd.to_datetime(self.history["ds"]).iloc[-1]
        off = pd.tseries.frequencies.to_offset(freq)
        future = pd.date_range(last + off, periods=periods, freq=off)
        if include_history:
            future = pd.to_datetime(self.history["ds"]).tolist() + list(future)
        return pd.DataFrame({"ds": future})

    def predict(self, df: pd.DataFrame | None = None) -> pd.DataFrame:
        """Prophet semantics: rows of ``df`` at or before the end of the
        training history get IN-SAMPLE fitted values; only rows after the
        last training timestamp are forecast h-steps ahead (Prophet returns
        in-sample yhat for history rows — the reference adapter inherits
        that via Prophet.predict)."""
        if df is None:
            df = self.make_future_dataframe(periods=self.m or 1)
        df = df.sort_values("ds").reset_index(drop=True)
        level = int(round(self.interval_width * 100))
        last_train = pd.to_datetime(self.history["ds"]).iloc[-1]
        ds = pd.to_datetime(df["ds"])
        is_hist = ds <= last_train
        h = int((~is_hist).sum())
        n = len(df)
        yhat = np.full(n, np.nan)
        lo = np.full(n, np.nan)
        hi = np.full(n, np.nan)
        if is_hist.any():
            res_fit = self.model.forecast(self._resid_y, 1, fitted=True)
            fitted = np.asarray(res_fit["fitted"], dtype=np.float64)
            hist_ds = pd.to_datetime(self.history["ds"]).reset_index(drop=True)
            pos = {t: i for i, t in enumerate(hist_ds)}
            idx = np.array([pos.get(t, -1) for t in ds[is_hist]])
            vals = np.where(idx >= 0, fitted[np.clip(idx, 0, None)], np.nan)
            yhat[is_hist.to_numpy()] = vals
            # Prophet exposes no uncertainty for in-sample rows by default;
            # use a constant residual band (same as fitted PIs elsewhere)
            resid = self._resid_y - fitted
            se = float(np.sqrt(np.nanmean(resid**2)))
            z = norm_ppf(0.5 + level / 200.0)
            lo[is_hist.to_numpy()] = vals - z * se
            hi[is_hist.to_numpy()] = vals + z * se
        if h:
            res = self.model.forecast(self._resid_y, h, level=[level])
            yhat[~is_hist.to_numpy()] = np.asarray(res["mean"], dtype=np.float64)
            lo[~is_hist.to_numpy()] = np.asarray(res[f"lo-{level}"], dtype=np.float64)
            hi[~is_hist.to_numpy()] = np.asarray(res[f"hi-{level}"], dtype=np.float64)
        if self._beta is not None:
            Xf = self._design(df)
            adj = np.hstack([np.ones((n, 1)), Xf]) @ self._beta
            yhat, lo, hi = yhat + adj, lo + adj, hi + adj
        return pd.DataFrame({"ds": df["ds"], "yhat": yhat,
                             "yhat_lower": lo, "yhat_upper": hi})
