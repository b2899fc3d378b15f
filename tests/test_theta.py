"""Theta-family kernels: recursion sanity, decomposition, AutoTheta selection,
AirPassengers behavioral checks."""

import numpy as np
import pytest

from sparkts.datagen import AIR_PASSENGERS
from sparkts.kernels.theta import (
    AutoTheta,
    DynamicOptimizedTheta,
    DynamicTheta,
    OptimizedTheta,
    Theta,
    _acf,
    auto_theta,
    seasonal_component,
    seasonality_test,
    theta_fit,
)

AP = AIR_PASSENGERS


def test_acf_matches_numpy_corr():
    rng = np.random.RandomState(0)
    y = rng.randn(300).cumsum()
    r = _acf(y, 5)
    assert r[0] == 1.0
    d = y - y.mean()
    exp1 = (d[:-1] @ d[1:]) / (d @ d)
    assert r[1] == pytest.approx(exp1, rel=1e-12)


def test_seasonality_detected_on_airpassengers():
    assert seasonality_test(AP, 12)
    rng = np.random.RandomState(1)
    assert not seasonality_test(rng.randn(200), 12)


def test_seasonal_component_properties():
    s_mul = seasonal_component(AP, 12, "multiplicative")
    assert s_mul.size == AP.size
    # indexes repeat with period 12 and average ~1
    np.testing.assert_allclose(s_mul[:12], s_mul[12:24])
    assert np.mean(s_mul[:12]) == pytest.approx(1.0, abs=1e-9)
    s_add = seasonal_component(AP, 12, "additive")
    assert np.mean(s_add[:12]) == pytest.approx(0.0, abs=1e-6)
    # July/August (peaks) above the mean, November below
    assert s_mul[6] > 1.05 and s_mul[10] < 0.95


def test_theta_fit_objective_sane():
    fit = theta_fit(AP, 12, "STM")
    assert 0.1 <= fit["par"]["alpha"] <= 0.99
    assert fit["par"]["theta"] == 2.0
    opt = theta_fit(AP, 12, "OTM")
    assert opt["par"]["theta"] >= 1.0
    # optimized theta must not be worse than fixed on its own objective
    assert opt["mse"] <= fit["mse"] * 1.01


def test_auto_theta_selects_and_forecasts():
    fit = auto_theta(AP, 12)
    assert fit["decompose"]
    assert fit["model_type"] in ("STM", "OTM", "DSTM", "DOTM")
    from sparkts.kernels.theta import forecast_theta

    res = forecast_theta(fit, 12, level=[80, 95])
    mean = res["mean"]
    assert mean.shape == (12,)
    # forecast in a sane band around the last season
    assert 300 < mean.mean() < 700
    # seasonal shape survives re-seasonalization: July > November
    assert mean[6] > mean[10]
    assert np.all(res["lo-95"] <= res["lo-80"])
    assert np.all(res["hi-80"] <= res["hi-95"])


def test_model_classes_spark_roundtrip(spark):
    from sparkts.datagen import air_passengers_df
    from sparkts.engine import SparkForecast

    ap = air_passengers_df(spark)
    sf = SparkForecast(
        [Theta(12), DynamicOptimizedTheta(12)], freq="ME"
    )
    out = sf.forecast(ap, h=6).toPandas()
    assert len(out) == 6
    assert np.isfinite(out["Theta"]).all()
    assert np.isfinite(out["DynamicOptimizedTheta"]).all()


def test_constant_series_guard():
    res = AutoTheta(1).forecast(np.full(50, 3.0), 5, level=[90])
    assert np.all(res["mean"] == 3.0)
    assert np.all(res["lo-90"] == 3.0)


def test_deterministic_intervals():
    a = OptimizedTheta(12).forecast(AP, 6, level=[90])
    b = OptimizedTheta(12).forecast(AP, 6, level=[90])
    np.testing.assert_array_equal(a["lo-90"], b["lo-90"])
