"""Kernel unit tests: loop-based oracles vs the vectorized kernels.

Mirrors the reference's dual-implementation strategy (its C++ kernels are
asserted equal to pure-Python reference loops, reference
tests/test_models.py:1419-1681): every block-vectorized scan here is checked
against a naive Python loop, and model outputs against analytic values.
"""

import numpy as np
import pytest

from sparkts.kernels import (
    ADIDA,
    IMAPA,
    TSB,
    CrostonClassic,
    CrostonOptimized,
    CrostonSBA,
    HistoricAverage,
    Naive,
    RandomWalkWithDrift,
    SeasonalExponentialSmoothing,
    SeasonalExponentialSmoothingOptimized,
    SeasonalNaive,
    SeasonalWindowAverage,
    SimpleExponentialSmoothing,
    SimpleExponentialSmoothingOptimized,
    WindowAverage,
    norm_ppf,
)
from sparkts.kernels.scan import golden_section_ses, ses_scan, ses_sse

rng = np.random.RandomState(7)
Y = np.abs(rng.randn(200)).cumsum() + 10.0
Y_SPARSE = np.where(rng.rand(120) < 0.2, rng.poisson(3, 120) + 1.0, 0.0)


def loop_ses(y, alpha):
    """Naive-loop SES oracle: l_t = a·y_t + (1−a)·l_{t−1}, fitted_t = l_{t−1}."""
    c = 1 - alpha
    level = y[0]
    fitted = np.full(y.size, np.nan)
    for t in range(1, y.size):
        fitted[t] = level
        level = alpha * y[t] + c * level
    # note level after loop includes y[-1]; recompute to match scan convention
    level = y[0]
    for t in range(1, y.size):
        level = alpha * y[t] + c * level
    return fitted, level


def test_norm_ppf():
    # classic z-scores
    assert norm_ppf(0.975) == pytest.approx(1.959963985, abs=1e-7)
    assert norm_ppf(0.95) == pytest.approx(1.644853627, abs=1e-7)
    assert norm_ppf(0.5) == pytest.approx(0.0, abs=1e-12)
    assert norm_ppf(0.0005) == pytest.approx(-3.29052673, abs=1e-6)


@pytest.mark.parametrize("alpha", [0.05, 0.1, 0.5, 0.9, 0.99])
@pytest.mark.parametrize("n", [1, 2, 63, 64, 65, 200, 1000])
def test_ses_scan_matches_loop(alpha, n):
    y = Y[:n] if n <= Y.size else np.abs(np.random.RandomState(n).randn(n)).cumsum()
    fitted, fcst = ses_scan(y, alpha)
    f2, l2 = loop_ses(y, alpha)
    np.testing.assert_allclose(fitted[1:], f2[1:], rtol=1e-10)
    assert fcst == pytest.approx(l2, rel=1e-10)
    assert np.isnan(fitted[0])


def test_ses_sse_matches_loop():
    for alpha in (0.1, 0.3, 0.8):
        f, _ = loop_ses(Y, alpha)
        e = Y[1:] - f[1:]
        assert ses_sse(Y, alpha) == pytest.approx(np.sum(e * e), rel=1e-10)


def test_golden_section_minimizes():
    alpha = golden_section_ses(Y, 0.01, 0.99)
    best = ses_sse(Y, alpha)
    for a in np.linspace(0.02, 0.98, 49):
        # golden section finds a local min; SSE in alpha is unimodal enough
        # that the found point must beat a coarse sweep within tolerance
        assert best <= ses_sse(Y, a) + 1e-6 * abs(best)


def test_naive():
    res = Naive().forecast(Y, 5, level=[80, 95], fitted=True)
    assert np.all(res["mean"] == Y[-1])
    np.testing.assert_allclose(res["fitted"][1:], Y[:-1])
    # intervals widen with horizon as sqrt(step)
    w = res["hi-95"] - res["lo-95"]
    np.testing.assert_allclose(w / w[0], np.sqrt(np.arange(1, 6)), rtol=1e-9)
    assert np.all(res["lo-95"] <= res["lo-80"])
    assert np.all(res["hi-80"] <= res["hi-95"])


def test_seasonal_naive_full_season():
    m = 7
    res = SeasonalNaive(m).forecast(Y, 10, fitted=True)
    np.testing.assert_allclose(res["mean"][:7], Y[-7:])
    np.testing.assert_allclose(res["mean"][7:10], Y[-7:-4])
    np.testing.assert_allclose(res["fitted"][m:], Y[:-m])


def test_seasonal_naive_partial_season():
    # 5 observations, season 7: positions 0,1 have no data → NaN
    y = Y[:5]
    res = SeasonalNaive(7).forecast(y, 7)
    assert np.isnan(res["mean"][0]) and np.isnan(res["mean"][1])
    np.testing.assert_allclose(res["mean"][2:], y)


def test_historic_average():
    res = HistoricAverage().forecast(Y, 3, level=[90], fitted=True)
    assert np.all(res["mean"] == pytest.approx(Y.mean()))
    assert np.all(res["fitted"] == pytest.approx(Y.mean()))
    # constant sigmah
    w = res["hi-90"] - res["lo-90"]
    assert w[0] == pytest.approx(w[-1])


def test_rwd():
    res = RandomWalkWithDrift().forecast(Y, 4, fitted=True)
    slope = (Y[-1] - Y[0]) / (Y.size - 1)
    np.testing.assert_allclose(res["mean"], Y[-1] + slope * np.arange(1, 5))
    np.testing.assert_allclose(res["fitted"][1:], Y[:-1] + slope)


def test_window_average():
    res = WindowAverage(10).forecast(Y, 3)
    assert np.all(res["mean"] == pytest.approx(Y[-10:].mean()))
    short = WindowAverage(500).forecast(Y, 3)
    assert np.all(np.isnan(short["mean"]))


def test_seasonal_window_average():
    m, w = 7, 4
    res = SeasonalWindowAverage(m, w).forecast(Y, 14)
    exp = Y[-m * w:].reshape(w, m).mean(axis=0)
    np.testing.assert_allclose(res["mean"][:7], exp)
    np.testing.assert_allclose(res["mean"][7:], exp)


def test_ses_models():
    res = SimpleExponentialSmoothing(0.3).forecast(Y, 3, level=[90], fitted=True)
    _, fcst = ses_scan(Y, 0.3)
    assert np.all(res["mean"] == pytest.approx(fcst))
    res_opt = SimpleExponentialSmoothingOptimized().forecast(Y, 3)
    assert np.isfinite(res_opt["mean"]).all()


def test_seasonal_ses():
    m = 7
    res = SeasonalExponentialSmoothing(m, 0.5).forecast(Y, 14, fitted=True)
    # phase i forecast = SES forecast of the phase-i subseries
    n = Y.size
    for i in range(3):
        sub = Y[i + n % m :: m]
        _, fc = ses_scan(sub, 0.5)
        assert res["mean"][i] == pytest.approx(fc)
    assert res["mean"][7] == pytest.approx(res["mean"][0])
    res_opt = SeasonalExponentialSmoothingOptimized(m).forecast(Y, 7)
    assert np.isfinite(res_opt["mean"]).all()
    # shorter than a season → NaN
    assert np.all(np.isnan(SeasonalExponentialSmoothing(7, 0.5).forecast(Y[:3], 2)["mean"]))


def test_croston_family():
    res = CrostonClassic().forecast(Y_SPARSE, 5, fitted=True)
    assert np.isfinite(res["mean"]).all()
    assert res["mean"][0] == res["mean"][-1]
    sba = CrostonSBA().forecast(Y_SPARSE, 5)
    assert sba["mean"][0] == pytest.approx(res["mean"][0] * 0.95)
    opt = CrostonOptimized().forecast(Y_SPARSE, 5)
    assert np.isfinite(opt["mean"]).all()
    # no-demand series → naive fallback
    zeros = np.zeros(50)
    assert np.all(CrostonClassic().forecast(zeros, 3)["mean"] == 0)


def test_intermittent_models():
    for model in (ADIDA(), IMAPA(), TSB(0.2, 0.2)):
        res = model.forecast(Y_SPARSE, 4)
        assert np.isfinite(res["mean"]).all(), repr(model)
        zero = model.forecast(np.zeros(30), 4)
        assert np.all(zero["mean"] == 0)


def test_tsb_semantics():
    res = TSB(0.3, 0.4).forecast(Y_SPARSE, 2)
    from sparkts.kernels.scan import demand, nonzero_probability

    _, pf = ses_scan(nonzero_probability(Y_SPARSE), 0.4)
    _, df_ = ses_scan(demand(Y_SPARSE), 0.3)
    assert res["mean"][0] == pytest.approx(pf * df_)


def test_no_native_intervals_raise():
    with pytest.raises(ValueError):
        WindowAverage(5).forecast(Y, 2, level=[90])
