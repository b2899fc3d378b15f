"""Exogenous-regressor path: kernel OLS recovery + the co-grouped Spark
round-trip (reference's exog tests: test_core.py:1428-1452 ReturnX model,
exog validation core.py:753-764)."""

import numpy as np
import pandas as pd
import pytest

from sparkts.engine import SparkForecast
from sparkts.kernels import LinearRegression, Naive


class TestOLSKernel:
    def test_recovers_coefficients(self):
        rng = np.random.default_rng(0)
        n = 200
        X = rng.normal(0, 1, (n, 2))
        y = 3.0 + 2.0 * X[:, 0] - 1.5 * X[:, 1] + rng.normal(0, 0.1, n)
        Xf = rng.normal(0, 1, (4, 2))
        m = LinearRegression()
        r = m.forecast(y, 4, level=[95], fitted=True, X=X, X_future=Xf)
        expect = 3.0 + 2.0 * Xf[:, 0] - 1.5 * Xf[:, 1]
        np.testing.assert_allclose(r["mean"], expect, atol=0.1)
        assert np.all(r["hi-95"] > r["mean"])
        assert len(r["fitted"]) == n

    def test_missing_exog_raises(self):
        m = LinearRegression()
        with pytest.raises(ValueError):  # reference core.py:753-764
            m.forecast(np.arange(10.0), 2)

    def test_wrong_future_rows_raises(self):
        m = LinearRegression()
        X = np.ones((10, 1))
        with pytest.raises(ValueError):
            m.forecast(np.arange(10.0), 3, X=X, X_future=np.ones((2, 1)))


class TestEngineExog:
    @pytest.fixture(scope="class")
    def frames(self, spark):
        rows, future = [], []
        for uid, (a, b) in {"s1": (2.0, 5.0), "s2": (-1.0, 20.0)}.items():
            x = np.linspace(0, 1, 40)
            for t in range(40):
                rows.append((uid, t, float(b + a * x[t]), float(x[t])))
            for k in range(3):
                future.append((uid, 40 + k, float(1.0 + 0.1 * k)))
        df = spark.createDataFrame(rows, "unique_id string, ds long, y double, x double")
        X_df = spark.createDataFrame(future, "unique_id string, ds long, x double")
        return df, X_df

    def test_cogrouped_exog_forecast(self, spark, frames):
        df, X_df = frames
        eng = SparkForecast([LinearRegression(), Naive()], freq=1)
        out = eng.forecast(df, h=3, X_df=X_df).toPandas()
        out = out.sort_values(["unique_id", "ds"]).reset_index(drop=True)
        assert list(out.columns) == ["unique_id", "ds", "LinearRegression", "Naive"]
        # exact linear data → exact prediction at the future x values
        s1 = out[out.unique_id == "s1"]
        np.testing.assert_allclose(
            s1["LinearRegression"], 5.0 + 2.0 * np.array([1.0, 1.1, 1.2]),
            atol=1e-8)
        s2 = out[out.unique_id == "s2"]
        np.testing.assert_allclose(
            s2["LinearRegression"], 20.0 - 1.0 * np.array([1.0, 1.1, 1.2]),
            atol=1e-8)
        # non-exog model ignores X entirely
        np.testing.assert_allclose(s1["Naive"].to_numpy(), 7.0)

    def test_uses_exog_without_xdf_raises(self, spark, frames):
        df, _ = frames
        eng = SparkForecast([LinearRegression()], freq=1)
        with pytest.raises(ValueError):
            eng.forecast(df, h=3)

    def test_future_timestamps_come_from_xdf(self, spark, frames):
        df, X_df = frames
        eng = SparkForecast([LinearRegression()], freq=1)
        out = eng.forecast(df, h=3, X_df=X_df).toPandas()
        assert sorted(out["ds"].unique()) == [40, 41, 42]


def _make_pd(uid, a, b):
    x = np.linspace(0, 1, 40)
    return pd.DataFrame({"unique_id": uid, "ds": range(40),
                         "y": b + a * x, "x": x})
