"""Heavy model kernels: AutoETS, MSTL, AutoARIMA, GARCH.

Mirrors the reference's test strategy (reference tests/test_models.py: one
class per model; known-good values on AirPassengers; parameter recovery on
synthetic data; interval ordering lo95≤lo80≤hi80≤hi95)."""

import numpy as np
import pytest

from sparkts.datagen import AIR_PASSENGERS
from sparkts.kernels import (
    ARCH,
    ARIMA,
    GARCH,
    MSTL,
    AutoARIMA,
    AutoETS,
    AutoRegressive,
    Holt,
    HoltWinters,
    SimpleExponentialSmoothingOptimized,
)
from sparkts.kernels.arima import arima_fit, arima_forecast, ndiffs, nsdiffs
from sparkts.kernels.ets import _etscalc, _fit_one
from sparkts.kernels.mstl import mstl, stl

AP = AIR_PASSENGERS


class TestETS:
    def test_ann_recursion_is_ses(self):
        # ETS(A,N,N) with fixed alpha/l0 must equal the SES recurrence
        y = np.array([10.0, 12.0, 11.0, 13.0, 12.5])
        f, l, b, s = _etscalc(y, 10.0, 0.0, [], 1, 0, 0, 0.3, 0, 0, 1.0)
        lvl = 10.0
        for i, yi in enumerate(y):
            assert f[i] == pytest.approx(lvl)
            lvl = 0.3 * yi + 0.7 * lvl
        assert l == pytest.approx(lvl)

    def test_fit_ann_close_to_optimized_ses(self):
        rng = np.random.RandomState(0)
        y = 50 + np.cumsum(rng.randn(100) * 0.1)
        fit = _fit_one(y, 1, 0, 0, 0, False)
        ses = SimpleExponentialSmoothingOptimized()
        r = ses.forecast(y, 1)
        ets_fc = fit["l"]
        assert ets_fc == pytest.approx(r["mean"][0], rel=0.02)

    def test_autoets_airpassengers(self):
        r = AutoETS(12).forecast(AP, 12, level=[80, 95], fitted=True)
        # seasonal shape: July peak > November trough, all positive
        assert r["mean"].min() > 350
        assert r["mean"][6] > r["mean"][10]
        assert np.all(r["lo-95"] <= r["lo-80"])
        assert np.all(r["lo-80"] <= r["hi-80"])
        assert np.all(r["hi-80"] <= r["hi-95"])
        assert len(r["fitted"]) == len(AP)
        # in-sample fit is tight on this canonical series
        mape = np.nanmean(np.abs((AP[12:] - r["fitted"][12:]) / AP[12:]))
        assert mape < 0.10

    def test_holt_linear_trend(self):
        y = 3.0 * np.arange(80) + 10
        r = Holt().forecast(y, 5)
        expect = 3.0 * np.arange(80, 85) + 10
        np.testing.assert_allclose(r["mean"], expect, rtol=0.02)

    def test_holtwinters_seasonal(self):
        t = np.arange(96)
        y = 100 + 2 * t + 20 * np.sin(2 * np.pi * t / 12)
        r = HoltWinters(12).forecast(y, 12)
        expect = 100 + 2 * (t[-1] + 1 + np.arange(12)) + 20 * np.sin(
            2 * np.pi * (t[-1] + 1 + np.arange(12)) / 12)
        np.testing.assert_allclose(r["mean"], expect, rtol=0.08, atol=8)


class TestMSTL:
    def test_stl_identity_and_recovery(self):
        rng = np.random.default_rng(7)
        t = np.arange(240)
        trend = 0.05 * t + 10
        seas = 3 * np.sin(2 * np.pi * t / 12)
        y = trend + seas + rng.normal(0, 0.3, t.size)
        d = stl(y, 12)
        np.testing.assert_allclose(d["seasonal"] + d["trend"] + d["remainder"], y)
        assert np.abs(d["trend"][24:-24] - trend[24:-24]).mean() < 0.2
        assert np.abs(d["seasonal"][24:-24] - seas[24:-24]).mean() < 0.3

    def test_mstl_multi_seasonal(self):
        rng = np.random.default_rng(8)
        t = np.arange(300)
        s5 = 1.5 * np.sin(2 * np.pi * t / 5)
        s12 = 3 * np.sin(2 * np.pi * t / 12)
        y = 10 + s5 + s12 + rng.normal(0, 0.2, t.size)
        d = mstl(y, [5, 12])
        assert set(d["seasonals"]) == {5, 12}
        assert np.abs(d["seasonals"][5][20:-20] - s5[20:-20]).mean() < 0.2

    def test_mstl_rejects_nans(self):
        y = np.arange(50.0)
        y[3] = np.nan
        with pytest.raises(ValueError):  # reference mstl.py:37-41
            mstl(y, [12])

    def test_mstl_model_forecast(self):
        t = np.arange(240)
        y = 0.1 * t + 5 * np.sin(2 * np.pi * t / 12) + 20
        r = MSTL(12).forecast(y, 12, level=[90], fitted=True)
        expect = 0.1 * (t[-1] + 1 + np.arange(12)) + 5 * np.sin(
            2 * np.pi * (t[-1] + 1 + np.arange(12)) / 12) + 20
        np.testing.assert_allclose(r["mean"], expect, atol=1.5)
        assert np.all(r["lo-90"] <= r["mean"]) and np.all(r["mean"] <= r["hi-90"])


class TestARIMA:
    def test_ar1_recovery(self):
        rng = np.random.default_rng(3)
        n = 500
        y = np.zeros(n)
        for t in range(1, n):
            y[t] = 5 + 0.7 * y[t - 1] + rng.normal(0, 1)
        fit = arima_fit(y, (1, 0, 0), include_mean=True)
        assert fit["parts"][0][0] == pytest.approx(0.7, abs=0.05)
        assert fit["sigma2"] == pytest.approx(1.0, abs=0.15)
        mean, se = arima_forecast(fit, 10)
        # converges toward the process mean 5/(1-0.7)
        assert mean[-1] == pytest.approx(5 / 0.3, abs=1.0)
        assert np.all(np.diff(se) >= -1e-12)  # widening intervals

    def test_ar1_high_persistence_recovery(self):
        # round-2 ADVICE repro: phi=0.95 used to collapse to ~0.02 because
        # the NM simplex started AR coefs at 0 with a 1e-4 perturbation
        rng = np.random.default_rng(7)
        n = 300
        y = np.zeros(n)
        for t in range(1, n):
            y[t] = 0.95 * y[t - 1] + rng.normal()
        y += 5.0
        fit = arima_fit(y, (1, 0, 0), include_mean=True)
        assert fit["parts"][0][0] == pytest.approx(0.95, abs=0.04)
        # SSE at the fit must beat the collapsed phi=0 solution by far
        assert fit["sigma2"] < 1.2

    def test_arma11_recovery(self):
        rng = np.random.default_rng(11)
        n = 400
        e = rng.normal(size=n)
        y = np.zeros(n)
        for t in range(1, n):
            y[t] = 0.8 * y[t - 1] + e[t] + 0.5 * e[t - 1]
        fit = arima_fit(y, (1, 0, 1), include_mean=True)
        phi, theta = fit["parts"][0][0], fit["parts"][1][0]
        assert phi == pytest.approx(0.8, abs=0.1)
        assert theta == pytest.approx(0.5, abs=0.15)

    def test_auto_arima_drift_candidate(self):
        # d+D==1 must consider a drift term (R auto.arima allowdrift=TRUE);
        # a drifted random walk should forecast with a positive slope
        from sparkts.kernels.arima import auto_arima
        rng = np.random.default_rng(1)
        y = np.cumsum(0.5 + rng.normal(0, 1, 200))
        fit = auto_arima(y, m=1)
        assert sum(fit["order"][1:2]) + sum(fit["seasonal"][1:2]) >= 1
        mean, _ = arima_forecast(fit, 20)
        slope = float(np.diff(mean).mean())
        assert 0.15 < slope < 0.9  # true drift 0.5

    def test_ma1_recovery(self):
        rng = np.random.default_rng(4)
        e = rng.normal(0, 1, 500)
        y = e[1:] + 0.6 * e[:-1]
        fit = arima_fit(y, (0, 0, 1), include_mean=True)
        assert fit["parts"][1][0] == pytest.approx(0.6, abs=0.07)

    def test_ndiffs_nsdiffs_airpassengers(self):
        assert ndiffs(AP) == 1
        assert nsdiffs(AP, 12) == 1
        rng = np.random.default_rng(0)
        assert ndiffs(rng.normal(0, 1, 200)) == 0

    def test_autoarima_airpassengers(self):
        r = AutoARIMA(12).forecast(AP, 12, level=[95], fitted=True)
        # R's auto.arima((2,1,1)(0,1,0)[12]) forecasts ≈ [445.6, 420.4, ...]
        assert r["mean"][0] == pytest.approx(446, abs=15)
        assert r["mean"][6] > r["mean"][0]  # July peak
        assert np.all(r["lo-95"] < r["mean"]) and np.all(r["mean"] < r["hi-95"])
        assert len(r["fitted"]) == len(AP)

    def test_fixed_arima_and_ar(self):
        rng = np.random.default_rng(5)
        y = np.cumsum(rng.normal(0.5, 1, 300))
        r = ARIMA((1, 1, 0)).forecast(y, 5)
        assert np.all(np.isfinite(r["mean"]))
        r2 = AutoRegressive(2).forecast(y, 5)
        assert np.all(np.isfinite(r2["mean"]))

    def test_arima_too_short_raises(self):
        with pytest.raises(ValueError):
            ARIMA((5, 0, 5)).forecast(np.arange(8.0), 3)

    @staticmethod
    def _shape(seed, n, season=7):
        r = np.random.default_rng(seed)
        t = np.arange(n)
        return (r.random() * 100 + 20 + (r.random() - 0.3) * 0.2 * t
                + (r.random() * 8 + 1) * np.sin(t * 2 * np.pi / season)
                + np.cumsum(r.random(n) - 0.5) * 0.4
                + (r.random(n) - 0.5) * (r.random() * 2 + 0.5))

    def test_pure_ar_closed_form_dominates_nm(self):
        # the OLS fast path in _fit_css is the EXACT CSS minimizer for
        # pure-AR models; it must never lose to the Nelder-Mead path it
        # replaced (regression guard for the closed-form branch)
        import sparkts.kernels.arima as A

        for i in range(6):
            z = np.diff(self._shape(i, 400))
            for (p, P) in [(1, 0), (3, 0), (0, 1), (0, 2)]:
                for use_mean in (True, False):
                    fast = A._fit_css(z, p, 0, P, 0, 7, use_mean)
                    orig = A._fit_css_pure_ar
                    A._fit_css_pure_ar = lambda *a, **k: None
                    try:
                        nm = A._fit_css(z, p, 0, P, 0, 7, use_mean)
                    finally:
                        A._fit_css_pure_ar = orig
                    assert fast is not None and nm is not None
                    assert fast["loglik"] >= nm["loglik"] - 1e-6, (
                        i, p, P, use_mean)

    def test_pure_ar_loglik_matches_kalman(self):
        # the Yule-Walker closed form and the Kalman filter compute the
        # same exact Gaussian likelihood (det Σ = σ²ⁿ·det V)
        import sparkts.kernels.arima as A

        rng = np.random.default_rng(3)
        x = rng.normal(0, 1, 500) + np.sin(np.arange(500) / 5)
        shapes = [np.array([0.6]), np.array([1.2, -0.5]),
                  np.array([0.95])]
        seas = np.zeros(14)
        seas[6], seas[13] = 0.5, -0.2
        shapes.append(seas)
        for phi in shapes:
            ar = A._ar_poly(phi)
            fast = A._pure_ar_loglik(x, ar)
            orig = A._pure_ar_loglik
            A._pure_ar_loglik = lambda *a: None
            try:
                kal = A._arma_exact_loglik(x, ar, np.array([1.0]))
            finally:
                A._pure_ar_loglik = orig
            assert fast is not None
            assert abs(fast[0] - kal[0]) <= 1e-7 * max(1, abs(kal[0]))
            assert abs(fast[1] - kal[1]) <= 1e-7 * max(1e-9, abs(kal[1]))


class TestGARCH:
    @pytest.fixture(scope="class")
    def garch_data(self):
        # the reference's generator semantics (reference garch.py:10-44)
        n, w, a, b = 600, 0.5, 0.3, 0.4
        y = np.zeros(n)
        s2 = np.zeros(n)
        np.random.seed(1)
        s2[0] = 1.0
        y[0] = np.random.randn()
        for k in range(1, n):
            s2[k] = w + a * y[k - 1] ** 2 + b * s2[k - 1]
            y[k] = np.random.randn() * np.sqrt(s2[k])
        return y

    def test_param_recovery(self, garch_data):
        from sparkts.kernels.garch import garch_fit

        mod = garch_fit(garch_data, 1, 1)
        w, a, b = mod["coeff"]
        assert a == pytest.approx(0.3, abs=0.12)
        assert a + b < 1.0
        assert w > 0

    def test_forecast_deterministic(self, garch_data):
        r1 = GARCH(1, 1).forecast(garch_data, 6, level=[95], fitted=True)
        r2 = GARCH(1, 1).forecast(garch_data, 6, level=[95], fitted=True)
        np.testing.assert_array_equal(r1["mean"], r2["mean"])
        assert np.all(r1["hi-95"] >= r1["mean"])
        assert len(r1["fitted"]) == len(garch_data)

    def test_arch_is_garch_p0(self, garch_data):
        r = ARCH(1).forecast(garch_data, 3)
        assert np.all(np.isfinite(r["mean"]))
        assert repr(ARCH(1)) == "ARCH(1)"
        assert repr(GARCH(1, 1)) == "GARCH(1,1)"


class TestCES:
    def test_autoces_airpassengers(self):
        from sparkts.kernels import AutoCES

        r = AutoCES(12).forecast(AIR_PASSENGERS, 12, level=[95], fitted=True)
        # strong multiplicative-ish seasonality: July peak, Nov trough
        assert r["mean"][6] > r["mean"][10]
        assert r["mean"].min() > 350
        mape = np.nanmean(
            np.abs((AIR_PASSENGERS[12:] - r["fitted"][12:]) / AIR_PASSENGERS[12:]))
        assert mape < 0.08
        assert np.all(r["lo-95"] < r["mean"]) and np.all(r["mean"] < r["hi-95"])

    def test_ces_season_selection_and_nonseasonal(self):
        from sparkts.kernels.ces import auto_ces

        rng = np.random.RandomState(2)
        flat = 50 + rng.randn(80)
        fit = auto_ces(flat, 12)
        assert fit["seasontype"] in ("N", "S", "P", "F")  # selection runs
        # m=1 forces N (reference ces.py:455-456)
        fit2 = auto_ces(flat, 1)
        assert fit2["seasontype"] == "N"
        # short series forces N too
        fit3 = auto_ces(flat[:20], 12)
        assert fit3["seasontype"] == "N"

    def test_ces_update_equations(self):
        # one hand-computed step of the N-type recursion (no backfit so the
        # initial state stays at its heuristic value)
        from sparkts.kernels.ces import _CODES, _ces_calc, _init_states

        y = np.array([10.0, 12.0])
        st0 = _init_states(y, 1, _CODES["N"])
        a0, a1 = 1.3, 1.0
        _, e, _, buf = _ces_calc(y, st0, 1, _CODES["N"], a0, a1, 0, 0,
                                 backfit=False)
        l0, c0 = st0[0]
        assert e[0] == pytest.approx(10.0 - l0)
        e0 = 10.0 - l0
        l1 = l0 - (1 - a1) * c0 + (a0 - a1) * e0
        c1 = l0 + (1 - a0) * c0 + (a0 + a1) * e0
        assert buf[1, 0] == pytest.approx(l1)
        assert buf[1, 1] == pytest.approx(c1)
        assert e[1] == pytest.approx(12.0 - l1)


class TestCSP:
    def test_mean_is_seasonal_naive(self):
        from sparkts.kernels import ConformalSeasonalPool, SeasonalNaive

        r = ConformalSeasonalPool(12).forecast(AP, 12)
        sn = SeasonalNaive(12).forecast(AP, 12)
        np.testing.assert_allclose(r["mean"], sn["mean"])

    def test_interval_ordering_and_determinism(self):
        from sparkts.kernels import ConformalSeasonalPool

        m = ConformalSeasonalPool(12, n_samples=400, seed=3)
        r1 = m.forecast(AP, 6, level=[80, 95])
        r2 = m.forecast(AP, 6, level=[80, 95])
        # lo95 <= lo80 <= hi80 <= hi95 (reference tests/test_csp.py:40-46)
        assert np.all(r1["lo-95"] <= r1["lo-80"])
        assert np.all(r1["lo-80"] <= r1["hi-80"])
        assert np.all(r1["hi-80"] <= r1["hi-95"])
        np.testing.assert_array_equal(r1["lo-95"], r2["lo-95"])

    def test_variant_validation(self):
        from sparkts.kernels import ConformalSeasonalPool

        with pytest.raises(ValueError):
            ConformalSeasonalPool(12, variant="bogus")

    def test_simulate_shape(self):
        from sparkts.kernels import ConformalSeasonalPool

        s = ConformalSeasonalPool(12).simulate(AP, 4, n_paths=30, seed=1)
        assert s.shape == (30, 4)

    def test_hash_sampler_deterministic_and_in_support(self):
        from sparkts.kernels import ConformalSeasonalPool

        m = ConformalSeasonalPool(12, n_samples=50, seed=9, sampler="hash")
        r1 = m.forecast(AP, 6, level=[90])
        r2 = m.forecast(AP, 6, level=[90])
        np.testing.assert_array_equal(r1["lo-90"], r2["lo-90"])
        assert np.all(r1["lo-90"] <= r1["hi-90"])
        # every hash draw is either a same-phase historical value or a
        # recentered calibration residual — both finite
        assert np.all(np.isfinite(r1["lo-90"]))
        with pytest.raises(ValueError):
            ConformalSeasonalPool(12, sampler="bogus")


class TestUCM:
    def test_local_level_flat(self):
        from sparkts.kernels import LocalLevel

        rng = np.random.default_rng(0)
        y = 50 + rng.normal(0, 1, 120)
        r = LocalLevel().forecast(y, 5, level=[90], fitted=True)
        assert r["mean"][0] == pytest.approx(50, abs=1.5)
        # flat forecast: every step equal
        np.testing.assert_allclose(r["mean"], r["mean"][0])
        assert np.all(np.diff(r["hi-90"] - r["lo-90"]) >= -1e-9)  # widening

    def test_lltrend_extrapolates_slope(self):
        from sparkts.kernels import LocalLinearTrend, SmoothTrend

        rng = np.random.default_rng(1)
        y = 10 + 0.5 * np.arange(150) + rng.normal(0, 1, 150)
        for M in (LocalLinearTrend, SmoothTrend):
            r = M().forecast(y, 6)
            slope = np.diff(r["mean"]).mean()
            assert slope == pytest.approx(0.5, abs=0.15)

    def test_front_door_dispatch(self):
        from sparkts.kernels import UCM

        m = UCM("lltrend")
        assert m.level == "lltrend"
        assert repr(m) == "UCM"
        with pytest.raises(ValueError):
            UCM("bogus")

    def test_cycle_component_captures_planted_cycle(self):
        # reference ucm.py:69-73 cycle spec: damped stochastic trig cycle
        from sparkts.kernels import UCM, LocalLevel

        rng = np.random.default_rng(0)
        n = 200
        t = np.arange(n)
        y = (20 + np.cumsum(rng.normal(0, 0.3, n))
             + 3 * np.cos(2 * np.pi * t / 8) + rng.normal(0, 0.5, n))
        plain = LocalLevel().forecast(y, 8, fitted=True)
        cyc = UCM(level="local level", cycle=True, stochastic_cycle=True,
                  damped_cycle=True).forecast(y, 8, fitted=True)
        rmse = lambda r: float(np.sqrt(np.nanmean((y[5:] - r["fitted"][5:]) ** 2)))  # noqa: E731
        assert rmse(cyc) < 0.6 * rmse(plain)
        # the forecast oscillates (cycle extrapolated), the plain one is flat
        assert np.std(cyc["mean"]) > 0.5

    def test_autoregressive_component(self):
        # reference ucm.py:73-74 autoregressive spec
        from sparkts.kernels import UCM

        rng = np.random.default_rng(3)
        n = 300
        ar = np.zeros(n)
        for t in range(1, n):
            ar[t] = 0.8 * ar[t - 1] + rng.normal()
        y = 50 + ar
        m = UCM(level="local level", autoregressive=1)
        r = m.forecast(y, 10, fitted=True)
        rmse = float(np.sqrt(np.nanmean((y[5:] - r["fitted"][5:]) ** 2)))
        assert rmse < 1.3  # close to the innovation sd of 1

    def test_seasonal_component(self):
        from sparkts.kernels import UCM

        rng = np.random.default_rng(4)
        seas = np.tile([5.0, -2.0, -1.0, -2.0], 50)
        y = 30 + seas + rng.normal(0, 0.3, 200)
        r = UCM(level="local level", seasonal=4).forecast(y, 8, fitted=True)
        # forecast repeats the planted seasonal shape
        np.testing.assert_allclose(r["mean"][:4], 30 + seas[:4], atol=1.0)
        np.testing.assert_allclose(r["mean"][:4], r["mean"][4:], atol=0.5)

    def test_rwdrift_level_form(self):
        from sparkts.kernels import UCM

        rng = np.random.default_rng(5)
        y = np.cumsum(0.5 + rng.normal(0, 1, 200))
        r = UCM(level="random walk with drift").forecast(y, 10)
        slope = float(np.diff(r["mean"]).mean())
        assert 0.2 < slope < 0.8


class TestMFLES:
    def test_airpassengers_fit_quality(self):
        from sparkts.kernels import MFLES

        r = MFLES(12).forecast(AP, 12, level=[90], fitted=True)
        mape = np.nanmean(np.abs((AP - r["fitted"]) / AP))
        assert mape < 0.05  # boosted decomposition fits this series tightly
        assert r["mean"][6] > r["mean"][10]  # July > November
        assert np.all(r["lo-90"] < r["hi-90"])

    def test_linear_trend_extrapolation(self):
        from sparkts.kernels import MFLES

        y = 3.0 * np.arange(100) + 5
        r = MFLES().forecast(y, 5)
        expect = 3.0 * np.arange(100, 105) + 5
        np.testing.assert_allclose(r["mean"], expect, rtol=0.05)

    def test_short_series_naive_fallback(self):
        from sparkts.kernels import MFLES

        r = MFLES().forecast(np.array([5.0, 6.0, 7.0]), 3)
        np.testing.assert_allclose(r["mean"], 7.0)

    def test_multiplicative_positive_seasonal(self):
        from sparkts.kernels.mfles import MFLESCore

        core = MFLESCore()
        core.fit(AP, seasonal_period=12)
        assert core.multiplicative is True
        assert np.all(core.predict(12) > 0)

    def test_automfles_selects_config(self):
        from sparkts.kernels import AutoMFLES

        r = AutoMFLES(12, test_size=12).forecast(AP, 12, fitted=True)
        mape = np.nanmean(np.abs((AP[12:] - r["fitted"][12:]) / AP[12:]))
        assert mape < 0.08
        assert np.all(np.isfinite(r["mean"]))


class TestTBATS:
    def test_harmonic_selection(self):
        from sparkts.kernels.tbats import find_harmonics

        t = np.arange(240)
        y = 10 + np.cos(2 * np.pi * t / 12) + 0.5 * np.sin(2 * np.pi * 2 * t / 12)
        k = find_harmonics(y, 12)
        assert 2 <= k <= 3  # two active harmonics

    def test_autotbats_airpassengers(self):
        from sparkts.kernels import AutoTBATS

        r = AutoTBATS(12).forecast(AP, 12, level=[90], fitted=True)
        mape = np.nanmean(np.abs((AP[24:] - r["fitted"][24:]) / AP[24:]))
        assert mape < 0.08
        assert r["mean"][6] > r["mean"][10]  # July > November
        assert np.all(r["lo-90"] < r["hi-90"])
        assert np.all(r["mean"] > 0)

    def test_boxcox_roundtrip(self):
        from sparkts.kernels.tbats import boxcox, inv_boxcox

        y = np.linspace(1, 50, 20)
        for lam in (0.0, 0.3, 1.0):
            np.testing.assert_allclose(inv_boxcox(boxcox(y, lam), lam), y,
                                       rtol=1e-9)

    def test_trend_variant(self):
        from sparkts.kernels import AutoTBATS

        y = 5.0 + 2.0 * np.arange(80)
        r = AutoTBATS(1, use_boxcox=False).forecast(y, 4)
        expect = 5.0 + 2.0 * np.arange(80, 84)
        np.testing.assert_allclose(r["mean"], expect, rtol=0.05)


class TestAutoMFLESGolden:
    """Pin the AutoMFLES config search end-to-end (the one optimizer family
    with no opt_dominance leg — its grid configs all route through the
    lasso coordinate-descent round, which is not SQL-replayable). Golden
    values computed once from the deterministic search; any change to the
    grid, the cv scorer, or the boosting rounds shows up here."""

    def _y(self):
        rng = np.random.default_rng(7)
        t = np.arange(90)
        return 40 + 0.2 * t + 6 * np.sin(2 * np.pi * t / 7) + rng.normal(0, 1.5, 90)

    def test_seasonal_grid_golden(self):
        from sparkts.kernels import AutoMFLES

        res = AutoMFLES(season_length=7).forecast(self._y(), 7)
        np.testing.assert_allclose(
            res["mean"],
            [52.752453, 59.100597, 64.290073, 66.586529, 62.326745,
             57.14175, 52.582902],
            atol=1e-5)

    def test_nonseasonal_grid_golden(self):
        from sparkts.kernels import AutoMFLES

        res = AutoMFLES(season_length=None).forecast(self._y(), 5)
        np.testing.assert_allclose(
            res["mean"],
            [57.650031, 57.764213, 57.878394, 57.992575, 58.106757],
            atol=1e-5)
