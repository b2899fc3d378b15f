"""Golden-value parity tests against the reference's published expectations.

Every expected array below is transcribed from the reference test suite
(cited per test), which in turn pins values from R's forecast/ces/stm
implementations on the AirPassengers series. These pin the DETERMINISTIC
cores of the heavy models (recursions with given parameters) — the piece a
SQL oracle can't reach — so driver rows-only checks are backed by value
parity here.
"""

import numpy as np
import pytest

from sparkts.datagen import AIR_PASSENGERS as ap
from sparkts.kernels import (
    HistoricAverage,
    Naive,
    RandomWalkWithDrift,
    SeasonalNaive,
    SimpleExponentialSmoothing,
    WindowAverage,
)


class TestBaselineGoldens:
    def test_ses_airpassengers(self):
        # reference tests/test_models.py:602-614 (R ses, initial="simple")
        ses = SimpleExponentialSmoothing(alpha=0.1)
        r = ses.forecast(ap, 12, fitted=True)
        np.testing.assert_allclose(r["mean"], np.repeat(460.3028, 12),
                                   rtol=1e-4)
        f = r["fitted"]
        assert np.isnan(f[0])
        np.testing.assert_allclose(f[1], 118 - 6.0)
        np.testing.assert_allclose(f[-1], 432 + 31.447525, rtol=1e-6)

    def test_historic_average_airpassengers(self):
        # reference tests/test_models.py:860-883
        r = HistoricAverage().forecast(ap, 12, level=[80], fitted=True)
        np.testing.assert_allclose(r["mean"], np.repeat(ap.mean(), 12),
                                   rtol=1e-5)
        np.testing.assert_almost_equal(r["fitted"][:4],
                                       np.repeat(280.2986, 4), decimal=4)
        np.testing.assert_almost_equal(r["lo-80"], np.repeat(126.0227, 12),
                                       decimal=4)

    def test_naive_airpassengers_lo80(self):
        # reference tests/test_models.py:925-944 (R naive intervals)
        r = Naive().forecast(ap, 12, level=[80])
        expected = np.array([388.7984, 370.9037, 357.1726, 345.5967,
                             335.3982, 326.1781, 317.6992, 309.8073,
                             302.3951, 295.3845, 288.7164, 282.3452])
        np.testing.assert_almost_equal(r["lo-80"], expected, decimal=4)

    def test_seasonal_naive_airpassengers(self):
        # reference tests/test_models.py:1075-1110 (R snaive)
        m = SeasonalNaive(12)
        r = m.forecast(ap, 12, level=[80], fitted=True)
        np.testing.assert_array_equal(
            r["fitted"][-3:], np.array([461 - 54.0, 390 - 28.0, 432 - 27.0]))
        expected = np.array([370.4595, 344.4595, 372.4595, 414.4595,
                             425.4595, 488.4595, 575.4595, 559.4595,
                             461.4595, 414.4595, 343.4595, 385.4595])
        np.testing.assert_almost_equal(r["lo-80"], expected, decimal=4)

    def test_rwd_airpassengers(self):
        # reference tests/test_models.py:1005-1012 (R rwf drift)
        r = RandomWalkWithDrift().forecast(ap, 2)
        np.testing.assert_allclose(r["mean"],
                                   np.array([434.2378, 436.4755]), rtol=1e-4)

    def test_window_average_airpassengers(self):
        # reference tests/test_models.py:1195-1198
        r = WindowAverage(24).forecast(ap, 12)
        np.testing.assert_allclose(r["mean"], np.repeat(ap[-24:].mean(), 12))


class TestThetaGoldens:
    def test_stm_fitted_states_match_r(self):
        # reference tests/test_theta.py:178-213: stm(AirPassengers, s=F,
        # estimation=F) fitted values from R with fixed params
        from sparkts.kernels.theta import _calc

        amse, e, states, obj = _calc(ap, "STM", ap[0] / 2, 0.5, 2.0, 3)
        np.testing.assert_array_almost_equal(
            states[:, 4][[0, 1, -1]],
            np.array([101.1550, 107.9061, 449.1692]), decimal=2)
        # fitted identity: y - e == mu states (reference test_theta.py:203)
        np.testing.assert_array_equal(ap - e, states[:, 4])

    def test_stm_forecasts_match_r(self):
        # reference tests/test_theta.py:216-253: R forecasts with the same
        # fixed parameters
        from sparkts.kernels.theta import _calc, _forecast_from

        _, _, states, _ = _calc(ap, "STM", ap[0] / 2, 0.5, 2.0, 3)
        f = _forecast_from(states, ap.size, "STM", 5, 0.5, 2.0)
        np.testing.assert_array_almost_equal(
            f, np.array([441.9132, 443.2418, 444.5704, 445.8990, 447.2276]),
            decimal=3)


class TestCESGoldens:
    def test_nonseasonal_forecast_matches_r(self):
        # reference tests/test_ces.py:72-90: R ces(AirPassengers, h=13) with
        # fixed alpha_0=2.001457, alpha_1=1.000727 (backfit enabled)
        from sparkts.kernels.ces import _N, _ces_calc, _ces_fcst, _init_states

        st0 = _init_states(ap, 12, _N)
        _, _, _, buf = _ces_calc(ap, st0, 1, _N, 2.001457, 1.000727, 0.0, 0.0)
        fc, _ = _ces_fcst(buf, ap.size + 1, 1, _N, 13,
                          2.001457, 1.000727, 0.0, 0.0)
        expected = np.array([430.9211, 432.4049, 431.2324, 432.7212,
                             431.5439, 433.0376, 431.8556, 433.3543,
                             432.1675, 433.6712, 432.4796, 433.9884,
                             432.7920])
        np.testing.assert_array_almost_equal(fc, expected, decimal=3)

    def test_nonseasonal_states_match_r(self):
        # reference tests/test_ces.py:62-70: backfitted state endpoints
        # (rows: refined initial state, last observation state, trailing
        # forecast state)
        from sparkts.kernels.ces import _N, _ces_calc, _init_states

        st0 = _init_states(ap, 12, _N)
        _, _, _, buf = _ces_calc(ap, st0, 1, _N, 2.001457, 1.000727, 0.0, 0.0)
        np.testing.assert_array_almost_equal(
            buf[0], np.array([112.068874, 1301.988803]), decimal=4)
        np.testing.assert_array_almost_equal(
            buf[-2], np.array([430.921548, 2040.195204]), decimal=4)
        np.testing.assert_array_almost_equal(
            buf[-1], np.array([432.40477, -1612.24622]), decimal=4)


class TestARIMAFixedGoldens:
    def test_arima_fixed_coefs_match_reference(self):
        # reference tests/test_models.py:543-551: ARIMA (2,0,0) with fixed
        # ar1=ar2=0.5 on AirPassengers gives [411.0, 421.5, 416.25, 418.875]
        from sparkts.kernels.arima import ARIMA

        m = ARIMA(order=(2, 0, 0), season_length=12,
                  fixed={"ar1": 0.5, "ar2": 0.5})
        r = m.forecast(ap, 4)
        np.testing.assert_array_equal(
            r["mean"], np.array([411.0, 421.5, 416.25, 418.875]))

    def test_autoregressive_lag_list_recovers_seasonal_naive(self):
        # reference tests/test_models.py:553-558: AR(lags=[12]) with
        # ar12≈1 reproduces seasonal naive
        from sparkts.kernels.arima import AutoRegressive

        m = AutoRegressive(lags=[12], fixed={"ar12": 0.9999999})
        r = m.forecast(ap, 13)
        np.testing.assert_almost_equal(r["mean"][:-1], ap[-12:], decimal=4)
