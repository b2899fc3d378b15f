"""Pin the compiled kernels (kernels/_native.c) to their Python twins.

The ETS recursion and the MA-feedback filter must be BIT-exact (their
Python paths sit behind value-graded oracles); the Kalman transient is
pinned to ~1e-12 relative (naive-matmul vs BLAS ordering — it only serves
rows-only-graded search likelihoods).
"""

from __future__ import annotations

import numpy as np
import pytest

import sparkts.kernels._native as nat
import sparkts.kernels.arima as ar
from sparkts.kernels.ets import _etscalc, _etscalc_py

pytestmark = pytest.mark.skipif(
    nat.LIB is None, reason="no C compiler / native kernels disabled")


def _random_arma(rng, pmax=4, qmax=4):
    p = int(rng.integers(0, pmax))
    q = int(rng.integers(0, qmax))
    m = int(rng.integers(2, 13))
    P = int(rng.integers(0, 2))
    Q = int(rng.integers(0, 2))
    phi = rng.uniform(-0.5, 0.5, p)
    theta = rng.uniform(-0.5, 0.5, q)
    Phi = rng.uniform(-0.5, 0.5, P)
    Th = rng.uniform(-0.5, 0.5, Q)
    arp = ar._poly_mul(
        ar._ar_poly(phi),
        ar._seasonal_expand(ar._ar_poly(Phi), m) if P else np.array([1.0]))
    map_ = ar._poly_mul(
        ar._ma_poly(theta),
        ar._seasonal_expand(ar._ma_poly(Th), m) if Q else np.array([1.0]))
    return arp, map_, m


def test_etscalc_bit_exact():
    rng = np.random.default_rng(11)
    checked = 0
    for _ in range(300):
        n = int(rng.integers(5, 400))
        m = int(rng.integers(1, 25))
        trend = int(rng.integers(0, 2))
        season = int(rng.integers(0, 3))
        if season and n < m:
            continue
        y = rng.normal(50, 10, n)
        if rng.random() < 0.5:
            y = np.abs(y) + 1
        s0 = list(rng.normal(1, 0.3, m)) if season else []
        alpha = rng.uniform(1e-4, 0.9999)
        beta = rng.uniform(1e-4, alpha)
        gamma = rng.uniform(1e-4, 1 - alpha)
        phi = rng.uniform(0.8, 1.0)
        args = (y, rng.normal(50, 5), rng.normal(0, 1), s0, m, trend,
                season, alpha, beta, gamma, phi)
        fc, lc, bc, sc = _etscalc(*args)
        fp, lp, bp, sp = _etscalc_py(*args)
        assert np.array_equal(fc, fp)
        assert lc == lp and bc == bp
        assert list(sc) == list(sp)
        checked += 1
    assert checked > 200


def test_ma_filter_bit_exact():
    rng = np.random.default_rng(12)
    for _ in range(300):
        n = int(rng.integers(10, 500))
        arp, map_, _ = _random_arma(rng)
        z = rng.normal(0, 1, n)
        e_c = ar._css_resid(z, arp, map_)
        saved, nat.LIB = nat.LIB, None
        try:
            e_p = ar._css_resid(z, arp, map_)
            seed = list(rng.normal(0, 1, int(rng.integers(0, 6))))
            a = rng.normal(0, 1, n)
            s_p = ar._ma_filter_seeded(a, map_, seed)
        finally:
            nat.LIB = saved
        s_c = ar._ma_filter_seeded(a, map_, seed)
        assert np.array_equal(e_c, e_p)
        assert np.array_equal(s_c, s_p)


def test_kalman_loglik_matches_numpy():
    rng = np.random.default_rng(13)
    checked = 0
    for trial in range(200):
        n = int(rng.integers(30, 600))
        arp, map_, m = _random_arma(rng, qmax=4)
        if map_.size <= 1 or not np.any(map_[1:]):
            continue
        x = rng.normal(0, 1, n)
        cap = None if trial % 2 else 80
        ll_c, s2_c = ar._arma_exact_loglik(x, arp, map_, exact_cap=cap)
        saved, nat.LIB = nat.LIB, None
        try:
            ll_p, s2_p = ar._arma_exact_loglik(x, arp, map_, exact_cap=cap)
        finally:
            nat.LIB = saved
        assert np.isfinite(ll_c) == np.isfinite(ll_p)
        if np.isfinite(ll_p):
            assert abs(ll_c - ll_p) <= 1e-9 * (1 + abs(ll_p))
            assert abs(s2_c - s2_p) <= 1e-9 * (1 + abs(s2_p))
            checked += 1
    assert checked > 100


def test_autoets_selection_unchanged_by_native():
    """End-to-end: the AutoETS search picks the same model and AICc with
    and without the native kernels (the recursion is bit-exact, so the
    whole search trajectory must be identical)."""
    from sparkts.kernels.ets import AutoETS

    rng = np.random.default_rng(14)
    t = np.arange(180)
    y = np.abs(50 + 0.05 * t + 8 * np.sin(2 * np.pi * t / 12)
               + rng.normal(0, 2, 180)) + 1
    fit_c = AutoETS(season_length=12)._fit(y)
    saved, nat.LIB = nat.LIB, None
    try:
        fit_p = AutoETS(season_length=12)._fit(y)
    finally:
        nat.LIB = saved
    assert (fit_c["error"], fit_c["trend"], fit_c["season"],
            fit_c["damped"]) == (fit_p["error"], fit_p["trend"],
                                 fit_p["season"], fit_p["damped"])
    assert fit_c["aicc"] == fit_p["aicc"]
    assert np.array_equal(fit_c["fitted"], fit_p["fitted"])
