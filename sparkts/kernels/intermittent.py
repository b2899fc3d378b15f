"""Intermittent-demand kernels: Croston family, ADIDA, IMAPA, TSB.

Semantics re-derived from the reference: CrostonClassic (reference
models.py:5047-5072), CrostonOptimized (models.py:5214-5253), CrostonSBA
(models.py:5395-5404), ADIDA (models.py:4874-4903), IMAPA (models.py:5551-5577),
TSB (models.py:5717-5739). All-zero series short-circuit to zeros (ADIDA/
IMAPA/TSB) or to Naive (Croston). These models expose no native gaussian
intervals in the reference (conformal only) — ``level=`` raises here too.
"""

from __future__ import annotations

import numpy as np

from sparkts.kernels.base import Model
from sparkts.kernels.scan import (
    chunk_forecast,
    chunk_sums,
    demand,
    expand_fitted_demand,
    expand_fitted_intervals,
    golden_section_ses,
    inter_demand_intervals,
    nonzero_probability,
    optimized_ses,
    ses_scan,
)


def _all_zero_result(y, h):
    mean = np.zeros(h)
    fitted_vals = np.zeros(y.size)
    fitted_vals[0] = np.nan
    return mean, None, fitted_vals


class CrostonClassic(Model):
    """SES(α=0.1) on demand sizes / SES(α=0.1) on inter-demand intervals."""

    _alpha = 0.1

    def _component_forecasts(self, yd, yi):
        fd, pd_ = ses_scan(yd, self._alpha)
        fi, pi_ = ses_scan(yi, self._alpha)
        return fd, pd_, fi, pi_

    def _forecast(self, y, h, fitted):
        yd = demand(y)
        if yd.size == 0:
            # degenerate: no demand at all → naive (reference models.py:5055)
            mean = np.full(h, y[-1])
            fitted_vals = np.full(y.size, np.nan)
            fitted_vals[1:] = y[:-1]
            return mean, None, fitted_vals
        yi = inter_demand_intervals(y)
        fd, pd_, fi, pi_ = self._component_forecasts(yd, yi)
        mean_val = pd_ / pi_ if pi_ != 0.0 else pd_
        mean = np.full(h, mean_val)
        fitted_vals = None
        if fitted and fd is not None:
            ydf = expand_fitted_demand(np.append(fd, pd_), y)
            yif = expand_fitted_intervals(np.append(fi, pi_), y)
            fitted_vals = ydf / yif
        return mean, None, fitted_vals


class CrostonOptimized(CrostonClassic):
    """Golden-section α per component, bounds (0.1, 0.3) (models.py:5224-5228).

    The reference's fitted path is O(n²) (re-optimizes per prefix,
    models.py:5237) — not implemented here; fitted returns None.
    """

    tunable = True

    def _component_forecasts(self, yd, yi):
        _, pd_, _ = optimized_ses(yd)
        _, pi_, _ = optimized_ses(yi)
        return None, pd_, None, pi_

    # ---- forward contract: the two golden-section α's are the tuned
    # state; forward re-runs the SES scans on the new demand/interval
    # series with them pinned (no search — the CrostonClassic path with
    # per-component α's).
    def fit_state(self, y, X=None):
        y = np.asarray(y, dtype=np.float64)
        yd = demand(y)
        if yd.size == 0:
            return {"empty": True}
        yi = inter_demand_intervals(y)
        return {"alpha_d": golden_section_ses(yd, 0.1, 0.3),
                "alpha_i": golden_section_ses(yi, 0.1, 0.3)}

    def forward(self, state, y, h, level=None, fitted=False,
                X=None, X_future=None):
        if level:
            raise ValueError(
                f"{self.alias} has no native prediction intervals")
        y = np.asarray(y, dtype=np.float64)
        yd = demand(y)
        if state.get("empty") or yd.size == 0:
            return self.forecast(y, h, fitted=fitted)
        yi = inter_demand_intervals(y)
        _, pd_ = ses_scan(yd, state["alpha_d"])
        _, pi_ = ses_scan(yi, state["alpha_i"])
        mean_val = pd_ / pi_ if pi_ != 0.0 else pd_
        return {"mean": np.full(h, mean_val)}


class CrostonSBA(CrostonClassic):
    """Classic × 0.95 bias correction (models.py:5395-5404)."""

    def _forecast(self, y, h, fitted):
        mean, sigmah, fitted_vals = super()._forecast(y, h, fitted)
        mean = mean * 0.95
        if fitted_vals is not None and demand(y).size > 0:
            fitted_vals = fitted_vals * 0.95
        return mean, sigmah, fitted_vals


class ADIDA(Model):
    """Aggregate-disaggregate: chunk at round(mean inter-demand interval),
    optimized SES on chunk sums, disaggregate equally (models.py:4874-4903)."""

    tunable = True

    def _forecast(self, y, h, fitted):
        if np.all(y == 0):
            return _all_zero_result(y, h)
        agg = round(float(inter_demand_intervals(y).mean()))
        agg = max(agg, 1)
        fcst = chunk_forecast(y, agg) / agg
        return np.full(h, fcst), None, None

    # ---- forward contract: the aggregation level + the golden-section α
    # on the chunk sums are the tuned state; forward re-chunks the new
    # series at the pinned level and re-runs the SES scan with the pinned α.
    def fit_state(self, y, X=None):
        y = np.asarray(y, dtype=np.float64)
        if np.all(y == 0):
            return {"zero": True}
        agg = max(round(float(inter_demand_intervals(y).mean())), 1)
        sums = chunk_sums(y[y.size % agg:], agg)
        alpha = (golden_section_ses(sums, 0.1, 0.3)
                 if sums.size > 1 else None)
        return {"agg": agg, "alpha": alpha}

    @staticmethod
    def _pinned_chunk_forecast(y, agg, alpha):
        """chunk_forecast with a pinned α (degenerate paths identical)."""
        y_cut = y[y.size % agg:]
        if y_cut.size < agg:
            return float(y[-1])
        sums = chunk_sums(y_cut, agg)
        if sums.size <= 1 or alpha is None:
            return float(sums[0]) if sums.size else float(y[-1])
        return ses_scan(sums, alpha)[1]

    def forward(self, state, y, h, level=None, fitted=False,
                X=None, X_future=None):
        if level:
            raise ValueError(
                f"{self.alias} has no native prediction intervals")
        y = np.asarray(y, dtype=np.float64)
        if state.get("zero") or np.all(y == 0):
            mean, _, _ = _all_zero_result(y, h)
            return {"mean": mean}
        agg = state["agg"]
        fcst = self._pinned_chunk_forecast(y, agg, state["alpha"]) / agg
        return {"mean": np.full(h, fcst)}


class IMAPA(Model):
    """Average of optimized-SES forecasts at every aggregation level
    1..round(mean interval) (models.py:5551-5577)."""

    tunable = True

    def _forecast(self, y, h, fitted):
        if np.all(y == 0):
            return _all_zero_result(y, h)
        max_agg = max(round(float(inter_demand_intervals(y).mean())), 1)
        fcsts = np.empty(max_agg)
        for agg in range(1, max_agg + 1):
            y_cut = y[y.size % agg:]
            sums = chunk_sums(y_cut, agg)
            if sums.size <= 1:
                f = float(sums[0]) if sums.size else float(y[-1])
            else:
                _, f, _ = optimized_ses(sums)
            fcsts[agg - 1] = f / agg
        return np.full(h, float(fcsts.mean())), None, None

    # ---- forward contract: the per-level golden-section α's (and the
    # max aggregation level) are the tuned state.
    def fit_state(self, y, X=None):
        y = np.asarray(y, dtype=np.float64)
        if np.all(y == 0):
            return {"zero": True}
        max_agg = max(round(float(inter_demand_intervals(y).mean())), 1)
        alphas = []
        for agg in range(1, max_agg + 1):
            sums = chunk_sums(y[y.size % agg:], agg)
            alphas.append(golden_section_ses(sums, 0.1, 0.3)
                          if sums.size > 1 else None)
        return {"max_agg": max_agg, "alphas": alphas}

    def forward(self, state, y, h, level=None, fitted=False,
                X=None, X_future=None):
        if level:
            raise ValueError(
                f"{self.alias} has no native prediction intervals")
        y = np.asarray(y, dtype=np.float64)
        if state.get("zero") or np.all(y == 0):
            mean, _, _ = _all_zero_result(y, h)
            return {"mean": mean}
        max_agg = state["max_agg"]
        fcsts = np.empty(max_agg)
        for agg in range(1, max_agg + 1):
            fcsts[agg - 1] = ADIDA._pinned_chunk_forecast(
                y, agg, state["alphas"][agg - 1]) / agg
        return {"mean": np.full(h, float(fcsts.mean()))}


class TSB(Model):
    """Teunter-Syntetos-Babai: SES(α_d) on demand × SES(α_p) on the
    nonzero-probability indicator (models.py:5717-5739)."""

    def __init__(self, alpha_d: float, alpha_p: float, alias: str | None = None):
        super().__init__(alias or "TSB")
        self.alpha_d = float(alpha_d)
        self.alpha_p = float(alpha_p)

    def _forecast(self, y, h, fitted):
        if np.all(y == 0):
            return _all_zero_result(y, h)
        yd = demand(y)
        yp = nonzero_probability(y)
        fp, pf = ses_scan(yp, self.alpha_p)
        fd, df_ = ses_scan(yd, self.alpha_d)
        mean = np.full(h, pf * df_)
        fitted_vals = None
        if fitted:
            ydft = expand_fitted_demand(np.append(fd, df_), y)
            fitted_vals = fp * ydft
        return mean, None, fitted_vals
