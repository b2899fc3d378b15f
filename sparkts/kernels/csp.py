"""ConformalSeasonalPool (CSP) — sample-based probabilistic seasonal model.

Semantics re-derived from the reference (reference models.py:4176-4561,
tests/test_csp.py; published as the "Conformal Seasonal Pool" method):

* point forecast = seasonal-naive (last season tiled);
* sample paths mix two draw sources per horizon step:
  (1) a signed-residual calibration pool — the most recent
      floor(calib_frac·n) lag-m differences, recentered on the point
      forecast, and
  (2) an exponentially-decayed (by age) pool of same-phase historical
      observations;
  mixture weight w: fixed variant 0.5; adaptive variant 0.3 when fewer than
  3 same-phase observations exist, 0 when m≤1 (reference models.py:4214-4222,
  adaptive w=0.3 for <3 cycles per tests/test_csp.py:60);
* intervals = empirical quantiles over the sample paths.

Deviation (documented): the reference draws from an UNSEEDED default_rng at
predict time (models.py:4366) — nondeterministic and partition-dependent.
Here the rng seed is an explicit parameter so Spark runs are reproducible
under any partitioning; the engine derives it per series.
"""

from __future__ import annotations

import numpy as np

from sparkts.kernels.base import Model
from sparkts.kernels.basic import SeasonalNaive


def _hash_uniform(seed: int, tag: str, p: int, j: int) -> float:
    """Deterministic uniform in [0,1) from md5(seed|tag|p|j) — the same
    convention as the engine's hash-bootstrap simulate, so an external SQL
    engine reproduces every draw."""
    import hashlib

    return int(hashlib.md5(f"{seed}|{tag}|{p}|{j}".encode()).hexdigest()[:8],
               16) / 4294967296.0


def csp_sample_paths(y, h, m, n_samples, variant, calib_frac, decay, rng, mu,
                     sampler="rng", seed=0):
    """``sampler='hash'`` replaces the rng draws with md5-derived ones:
    pool pick = inverse-CDF of the exp-decay weights at u, residual pick =
    ⌊u·|R|⌋, mixture flag = (u < w) — each u a pure function of
    (seed, draw-kind, path, step), so the whole sampling is SQL-replayable
    (driver query csp_hash_intervals)."""
    n = y.size
    t_cal = int(np.floor(calib_frac * n))
    calib_start = max(m, n - t_cal)
    R = y[calib_start:] - y[calib_start - m : max(0, n - m)]
    mu = mu.copy()
    if np.any(np.isnan(mu)):
        mu[np.isnan(mu)] = y[-1]
    indices = np.arange(n)
    samples = np.empty((n_samples, h), dtype=np.float64)
    for j in range(h):
        phase_j = (n + j) % m
        pool_idx = indices[indices % m == phase_j]
        pool_vals = y[pool_idx]
        k = pool_vals.size
        if k == 0 and R.size == 0:
            samples[:, j] = mu[j]
            continue
        if m <= 1 and variant == "adaptive":
            w = 0.0
        elif variant == "adaptive" and k < 3:
            w = 0.3
        else:
            w = 0.5
        if k == 0:
            w = 0.0
        elif R.size == 0:
            w = 1.0
        if sampler == "hash":
            if k > 0:
                ages = (n - 1) - pool_idx
                raw = np.exp(-decay * ages)
                cum = np.cumsum(raw)
                u = np.array([_hash_uniform(seed, "p", p, j)
                              for p in range(n_samples)])
                pick = np.searchsorted(cum, u * cum[-1], side="left")
                pool_draws = pool_vals[np.minimum(pick, k - 1)]
            else:
                pool_draws = np.empty(n_samples)
            if R.size:
                u = np.array([_hash_uniform(seed, "r", p, j)
                              for p in range(n_samples)])
                ridx = np.minimum((u * R.size).astype(np.int64), R.size - 1)
                resid_draws = R[ridx] + mu[j]
            else:
                resid_draws = pool_draws
            um = np.array([_hash_uniform(seed, "m", p, j)
                           for p in range(n_samples)])
            use_pool = um < w
        else:
            if k > 0:
                ages = (n - 1) - pool_idx
                raw = np.exp(-decay * ages)
                pool_draws = rng.choice(pool_vals, size=n_samples,
                                        p=raw / raw.sum())
            else:
                pool_draws = np.empty(n_samples)
            resid_draws = ((rng.choice(R, size=n_samples) + mu[j])
                           if R.size else pool_draws)
            use_pool = rng.random(n_samples) < w
        samples[:, j] = np.where(use_pool, pool_draws, resid_draws)
    return mu, samples


class ConformalSeasonalPool(Model):
    """CSP (reference models.py:4241). Intervals are sample quantiles;
    needs ≥ ceil(2/(1−L/100))−1 samples for a level-L interval."""

    def __init__(self, season_length: int, n_samples: int = 100,
                 variant: str = "adaptive", calib_frac: float = 0.5,
                 decay: float = 0.01, seed: int = 1,
                 sampler: str = "rng", alias: str | None = None):
        super().__init__(alias or "ConformalSeasonalPool")
        if variant not in ("adaptive", "fixed"):
            raise ValueError("variant must be 'adaptive' or 'fixed'")
        if sampler not in ("rng", "hash"):
            raise ValueError("sampler must be 'rng' or 'hash'")
        self.m = max(int(season_length), 1)
        self.n_samples = n_samples
        self.variant = variant
        self.calib_frac = calib_frac
        self.decay = decay
        self.seed = seed
        self.sampler = sampler

    def forecast(self, y, h, level=None, fitted=False, X=None, X_future=None):
        y = np.asarray(y, dtype=np.float64)
        sn = SeasonalNaive(self.m)
        base = sn.forecast(y, h, fitted=fitted)
        mu = np.asarray(base["mean"], dtype=np.float64)
        res = {"mean": mu}
        if fitted and "fitted" in base:
            res["fitted"] = base["fitted"]
        if level:
            rng = np.random.default_rng(self.seed)
            mu, samples = csp_sample_paths(
                y, h, self.m, self.n_samples, self.variant,
                self.calib_frac, self.decay, rng, mu,
                sampler=self.sampler, seed=self.seed)
            res["mean"] = mu
            for lv in sorted(level):
                res[f"lo-{lv}"] = np.quantile(samples, (100 - lv) / 200.0, axis=0)
                res[f"hi-{lv}"] = np.quantile(samples, 1 - (100 - lv) / 200.0, axis=0)
        return res

    # ---- forward contract: in the reference, CSP.forward IS forecast
    # (models.py:4469-4495 delegates to self.forecast verbatim) — the
    # calibration pool is derived from whatever data forward receives, by
    # design. Made explicit here (not inherited silently) so the semantics
    # are documented and regression-tested (tests/test_refit.py).
    def fit_state(self, y, X=None):
        return None

    def forward(self, state, y, h, level=None, fitted=False,
                X=None, X_future=None):
        return self.forecast(y, h, level=level, fitted=fitted)

    def simulate(self, y, h, n_paths=100, seed=0, error_dist="normal"):
        y = np.asarray(y, dtype=np.float64)
        mu = np.asarray(SeasonalNaive(self.m).forecast(y, h)["mean"], dtype=np.float64)
        rng = np.random.default_rng(seed)
        _, samples = csp_sample_paths(
            y, h, self.m, n_paths, self.variant, self.calib_frac,
            self.decay, rng, mu)
        return samples
