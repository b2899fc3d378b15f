"""Exponential-smoothing kernels (fixed-α, optimized, seasonal variants).

Semantics re-derived from the reference: SES (reference models.py:2281-2291),
SES-optimized with golden-section α ∈ (0.01, 0.99) (models.py:2482-2493),
per-phase seasonal SES (models.py:2679-2703) and its optimized variant
(models.py:2911-2934). Interval formulas: sigmah = σ·√(1 + (step−1)·α²)
(models.py:2380) and, for seasonal variants, σ·√(1 + (k−1)·α²) with
k = ⌊(step−1)/m⌋ + 1 (models.py:2799-2806). The recurrence itself lives in
``sparkts.kernels.scan`` as a block-vectorized numpy scan.
"""

from __future__ import annotations

import numpy as np

from sparkts.kernels.base import Model, residual_sigma
from sparkts.kernels.basic import _tile_seasonal
from sparkts.kernels.scan import golden_section_ses, ses_scan


def _ses_sigmah(y, fitted_vals, alpha, h):
    resid = y[1:] - fitted_vals[1:]
    sigma = residual_sigma(resid, resid.size - 1)
    steps = np.arange(1, h + 1)
    return sigma * np.sqrt(1 + (steps - 1) * alpha**2)


def _ses_sim_paths(last_level: float, alpha: float, errs: np.ndarray) -> np.ndarray:
    """SES path recursion (reference models.py:2419-2428): observe
    level + e, then update level = α·obs + (1-α)·level — variance grows
    as 1 + (i-1)·α², matching _ses_sigmah."""
    n_paths, h = errs.shape
    paths = np.empty_like(errs)
    levels = np.full(n_paths, last_level)
    for i in range(h):
        paths[:, i] = levels + errs[:, i]
        levels = alpha * paths[:, i] + (1 - alpha) * levels
    return paths


def _seasonal_ses_sim_paths(season_vals: np.ndarray, alphas: np.ndarray,
                            errs: np.ndarray) -> np.ndarray:
    """Per-phase SES recursion (reference models.py:2844-2852): each
    seasonal phase keeps its own level, updated with its own alpha."""
    n_paths, h = errs.shape
    m = season_vals.size
    paths = np.empty_like(errs)
    levels = np.tile(season_vals, (n_paths, 1))
    for i in range(h):
        s = i % m
        paths[:, i] = levels[:, s] + errs[:, i]
        levels[:, s] = alphas[s] * paths[:, i] + (1 - alphas[s]) * levels[:, s]
    return paths


class SimpleExponentialSmoothing(Model):
    def __init__(self, alpha: float, alias: str | None = None):
        super().__init__(alias or "SES")
        self.alpha = float(alpha)

    def _forecast(self, y, h, fitted):
        fitted_vals, fcst = ses_scan(y, self.alpha)
        mean = np.full(h, fcst)
        return mean, _ses_sigmah(y, fitted_vals, self.alpha, h), fitted_vals

    def _sim_paths(self, y, h, mean, errs):
        return _ses_sim_paths(mean[0], self.alpha, errs)


class SimpleExponentialSmoothingOptimized(Model):
    tunable = True

    def fit_state(self, y):
        return {"alpha": golden_section_ses(np.asarray(y, float), 0.01, 0.99)}

    def forward(self, state, y, h, level=None, fitted=False):
        """Re-apply the fitted alpha (reference forward semantics)."""
        return SimpleExponentialSmoothing(
            state["alpha"], alias=self.alias
        ).forecast(y, h, level=level, fitted=fitted)

    def __init__(self, alias: str | None = None):
        super().__init__(alias or "SESOpt")

    def _forecast(self, y, h, fitted):
        alpha = golden_section_ses(y, 0.01, 0.99)
        fitted_vals, fcst = ses_scan(y, alpha)
        mean = np.full(h, fcst)
        return mean, _ses_sigmah(y, fitted_vals, alpha, h), fitted_vals

    def _sim_paths(self, y, h, mean, errs):
        alpha = golden_section_ses(y, 0.01, 0.99)
        return _ses_sim_paths(mean[0], alpha, errs)


class _SeasonalSESBase(Model):
    """Shared per-phase machinery: phase i's subseries starts at
    ``i + n % m`` so phases align to the series end (models.py:2693)."""

    season_length: int

    def _phase_alpha(self, sub: np.ndarray, abs_phase: int) -> float:
        """α for the subseries whose elements sit at t ≡ abs_phase (mod m)."""
        raise NotImplementedError

    def _forecast(self, y, h, fitted):
        m = self.season_length
        n = y.size
        if n < m:
            return np.full(h, np.nan), None, np.full(n, np.nan)
        season_vals = np.empty(m)
        fitted_vals = np.full(n, np.nan)
        alphas = np.empty(m)
        for i in range(m):
            idx0 = i + n % m
            sub = y[idx0::m]
            alpha = self._phase_alpha(sub, idx0 % m)
            alphas[i] = alpha
            f, fc = ses_scan(sub, alpha)
            season_vals[i] = fc
            fitted_vals[idx0::m] = f
        mean = _tile_seasonal(season_vals, h)
        resid = y - fitted_vals
        sigma = residual_sigma(resid[~np.isnan(fitted_vals)] if n else resid, max(n - m, 1))
        steps = np.arange(1, h + 1)
        k = (steps - 1) // m + 1
        sigmah = sigma * np.sqrt(1 + (k - 1) * float(np.mean(alphas)) ** 2)
        return mean, sigmah, fitted_vals

    def _sim_paths(self, y, h, mean, errs):
        m = self.season_length
        n = y.size
        if n < m:
            return mean[None, :] + errs
        season_vals = np.empty(m)
        alphas = np.empty(m)
        for i in range(m):
            idx0 = i + n % m
            sub = y[idx0::m]
            alphas[i] = self._phase_alpha(sub, idx0 % m)
            season_vals[i] = ses_scan(sub, alphas[i])[1]
        return _seasonal_ses_sim_paths(season_vals, alphas, errs)


class SeasonalExponentialSmoothing(_SeasonalSESBase):
    def __init__(self, season_length: int, alpha: float, alias: str | None = None):
        super().__init__(alias or "SeasonalES")
        self.season_length = int(season_length)
        self.alpha = float(alpha)

    def _phase_alpha(self, sub, abs_phase):
        return self.alpha


class _PinnedSeasonalES(_SeasonalSESBase):
    """Per-phase SES with α's pinned by ABSOLUTE phase (t mod m) — the
    forward twin of the optimized variant. Lookup by absolute phase keeps
    alignment correct as the series grows (the i-th end-aligned subseries
    shifts phase when n changes)."""

    def __init__(self, season_length: int, alphas_by_phase: dict,
                 alias: str | None = None):
        super().__init__(alias or "SeasESPinned")
        self.season_length = int(season_length)
        self._alphas = dict(alphas_by_phase)

    def _phase_alpha(self, sub, abs_phase):
        return self._alphas[abs_phase]


class SeasonalExponentialSmoothingOptimized(_SeasonalSESBase):

    tunable = True

    def __init__(self, season_length: int, alias: str | None = None):
        super().__init__(alias or "SeasESOpt")
        self.season_length = int(season_length)

    def _phase_alpha(self, sub, abs_phase):
        return golden_section_ses(sub, 0.01, 0.99)

    # ---- forward contract: the m golden-section α's are the tuned state,
    # keyed by ABSOLUTE phase so re-application to a longer series maps
    # each subseries to the α fitted for its calendar phase.
    def fit_state(self, y, X=None):
        y = np.asarray(y, dtype=np.float64)
        m, n = self.season_length, y.size
        if n < m:
            return {"short": True}
        alphas = {}
        for i in range(m):
            idx0 = i + n % m
            alphas[idx0 % m] = golden_section_ses(y[idx0::m], 0.01, 0.99)
        return {"alphas_by_phase": alphas}

    def forward(self, state, y, h, level=None, fitted=False,
                X=None, X_future=None):
        y = np.asarray(y, dtype=np.float64)
        if state.get("short") or y.size < self.season_length:
            return self.forecast(y, h, level=level, fitted=fitted)
        pinned = _PinnedSeasonalES(self.season_length,
                                   state["alphas_by_phase"], alias=self.alias)
        return pinned.forecast(y, h, level=level, fitted=fitted)
