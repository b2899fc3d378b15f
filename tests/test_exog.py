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


class TestCvExog:
    def test_cv_threads_exog_through_windows(self, spark):
        # y is an exact linear function of x → OLS backtest error ≈ 0 in
        # every window (reference threads X per window, core.py:294-300)
        rows = []
        rng = np.random.default_rng(0)
        for uid in ("a", "b"):
            x = rng.normal(0, 1, 60)
            y = 4.0 + 3.0 * x
            for t in range(60):
                rows.append((uid, t, float(y[t]), float(x[t])))
        df = spark.createDataFrame(
            rows, "unique_id string, ds long, y double, x double")
        eng = SparkForecast([LinearRegression(), Naive()], freq=1)
        out = eng.cross_validation(df, h=4, n_windows=3, step_size=4).toPandas()
        assert len(out) == 2 * 3 * 4
        np.testing.assert_allclose(out["LinearRegression"], out["y"], atol=1e-8)
        # Naive is y-only and generally wrong on this data
        assert np.abs(out["Naive"] - out["y"]).max() > 0.1

    def test_cv_exog_refit_false_reapplies_beta(self, spark):
        # refit=False fits beta on window 0 and re-applies it (reference
        # threads X through forward, core.py:322-354). With exact linear
        # data the window-0 beta is already perfect → zero error everywhere.
        rows = []
        rng = np.random.default_rng(1)
        for uid in ("a", "b"):
            x = rng.normal(0, 1, 60)
            y = 2.0 - 1.5 * x
            rows += [(uid, t, float(y[t]), float(x[t])) for t in range(60)]
        df = spark.createDataFrame(
            rows, "unique_id string, ds long, y double, x double")
        eng = SparkForecast([LinearRegression()], freq=1)
        out = eng.cross_validation(df, h=4, n_windows=3, step_size=4,
                                   refit=False).toPandas()
        np.testing.assert_allclose(out["LinearRegression"], out["y"],
                                   atol=1e-8)

    def test_cv_exog_requires_exog_columns(self, spark):
        df = spark.createDataFrame(
            [("a", t, float(t)) for t in range(30)],
            "unique_id string, ds long, y double")
        eng = SparkForecast([LinearRegression()], freq=1)
        with pytest.raises(ValueError, match="exog"):
            eng.cross_validation(df, h=2, n_windows=2)


class TestFittedPI:
    def test_fitted_values_level(self, spark):
        rng = np.random.default_rng(1)
        rows = [("a", t, float(10 + rng.normal())) for t in range(50)]
        df = spark.createDataFrame(rows, "unique_id string, ds long, y double")
        eng = SparkForecast([Naive()], freq=1)
        out = eng.fitted_values(df, level=[80, 95]).toPandas()
        assert set(out.columns) >= {"Naive", "Naive-lo-80", "Naive-hi-80",
                                    "Naive-lo-95", "Naive-hi-95"}
        ok = out.dropna()
        # constant-width band: hi - fitted == z*sigma everywhere
        w95 = (ok["Naive-hi-95"] - ok["Naive"]).to_numpy()
        np.testing.assert_allclose(w95, w95[0])
        w80 = (ok["Naive-hi-80"] - ok["Naive"]).to_numpy()
        assert np.all(w80 < w95)
        np.testing.assert_allclose(
            w95[0] / w80[0], 1.959964 / 1.2815516, rtol=1e-4)

    def test_cv_fitted_values(self, spark):
        rows = [("a", t, float(t)) for t in range(30)]
        df = spark.createDataFrame(rows, "unique_id string, ds long, y double")
        eng = SparkForecast([Naive()], freq=1)
        out = eng.cross_validation_fitted_values(
            df, h=3, n_windows=2, step_size=3).toPandas()
        # window 1 trains on 24 rows, window 2 on 27
        assert len(out) == 24 + 27
        assert set(out["cutoff"]) == {23, 26}
        blk = out[out.cutoff == 23].sort_values("ds")
        np.testing.assert_allclose(
            blk["Naive"].to_numpy()[1:], np.arange(23.0))  # naive fitted=lag


class TestArimaExog:
    """Regression-with-ARIMA-errors (reference arima.py:1316 Arima xreg,
    AutoARIMA X models.py:306-352): OLS detrend on [1, X], ARMA on the
    residual, forecast adds X_future·β back."""

    def _series(self, n=120, seed=3):
        rng = np.random.default_rng(seed)
        x = rng.normal(10, 2, n)
        eps = np.empty(n)
        eps[0] = rng.normal()
        for t in range(1, n):  # AR(1) errors, phi=0.7
            eps[t] = 0.7 * eps[t - 1] + rng.normal(0, 0.5)
        y = 5.0 + 2.0 * x + eps
        return y, x.reshape(-1, 1)

    def test_kernel_two_step_equivalence(self):
        from sparkts.kernels import ARIMA
        from sparkts.kernels.arima import _exog_design

        y, X = self._series()
        Xf = np.full((6, 1), 12.0)
        m = ARIMA((1, 0, 0), include_mean=False)
        res = m.forecast(y, 6, X=X, X_future=Xf)
        # manual two-step with the same kernel
        A = _exog_design(X)
        beta, *_ = np.linalg.lstsq(A, y, rcond=None)
        resid = y - A @ beta
        inner = ARIMA((1, 0, 0), include_mean=False).forecast(resid, 6)
        expect = inner["mean"] + _exog_design(Xf) @ beta
        np.testing.assert_allclose(res["mean"], expect, rtol=1e-12)
        # beta recovered ≈ (5, 2)
        assert abs(beta[0] - 5.0) < 1.5 and abs(beta[1] - 2.0) < 0.2

    def test_kernel_univariate_path_unchanged(self):
        from sparkts.kernels import ARIMA

        y, _ = self._series()
        a = ARIMA((1, 0, 0)).forecast(y, 4)
        b = ARIMA((1, 0, 0)).forecast(y, 4)  # no X → plain path
        np.testing.assert_allclose(a["mean"], b["mean"])

    def test_autoarima_exog(self):
        from sparkts.kernels import AutoARIMA

        y, X = self._series()
        Xf = np.full((4, 1), 11.0)
        res = AutoARIMA().forecast(y, 4, X=X, X_future=Xf)
        # forecast should sit near beta0 + beta1*11 ≈ 27
        assert np.all(np.abs(res["mean"] - 27.0) < 6.0)

    def test_engine_forecast_with_arima_exog(self, spark):
        from sparkts.kernels import ARIMA

        y, X = self._series(80)
        rows = [(u, t, float(y[t]), float(X[t, 0]))
                for u in ("a", "b") for t in range(80)]
        df = spark.createDataFrame(rows, "unique_id string, ds long, y double, x double")
        fut = [(u, 80 + s, 12.0) for u in ("a", "b") for s in range(3)]
        X_df = spark.createDataFrame(fut, "unique_id string, ds long, x double")
        sf = SparkForecast([ARIMA((1, 0, 0), include_mean=False)], freq=1)
        out = sf.forecast(df, h=3, X_df=X_df).toPandas()
        assert len(out) == 6
        assert np.all(np.isfinite(out["ARIMA"]))

    def test_fit_predict_exog_roundtrip(self, spark, tmp_path):
        """predict-from-state with exog (VERDICT r2 item 8): fit persists
        the train X inside the blob; predict takes future X via X_df and
        matches the direct forecast exactly."""
        from sparkts.kernels import ARIMA, LinearRegression

        y, X = self._series(80)
        rows = [(u, t, float(y[t]), float(X[t, 0]))
                for u in ("a", "b") for t in range(80)]
        df = spark.createDataFrame(rows, "unique_id string, ds long, y double, x double")
        fut = [(u, 80 + s, 12.0) for u in ("a", "b") for s in range(3)]
        X_df = spark.createDataFrame(fut, "unique_id string, ds long, x double")
        sf = SparkForecast(
            [LinearRegression(), ARIMA((1, 0, 0), include_mean=False)], freq=1)
        states = sf.fit(df)
        path = str(tmp_path / "states.parquet")
        states.write.mode("overwrite").parquet(path)
        back = spark.read.parquet(path)
        got = (sf.predict(back, h=3, X_df=X_df)
               .toPandas().sort_values(["unique_id", "ds"]).reset_index(drop=True))
        want = (sf.forecast(df, h=3, X_df=X_df)
                .toPandas().sort_values(["unique_id", "ds"]).reset_index(drop=True))
        np.testing.assert_allclose(got["LinearRegression"],
                                   want["LinearRegression"], rtol=1e-9)
        np.testing.assert_allclose(got["ARIMA"], want["ARIMA"], rtol=1e-9)

    def test_predict_reorders_permuted_xdf_columns(self, spark):
        """ADVICE r3: an X_df whose regressor columns arrive in a different
        order than at fit time must be reindexed to the persisted fit-time
        order, never applied positionally."""
        from sparkts.kernels import LinearRegression

        rng = np.random.default_rng(3)
        n = 60
        X = rng.normal(0, 1, (n, 2))
        y = 1.0 + 3.0 * X[:, 0] - 2.0 * X[:, 1] + rng.normal(0, 0.05, n)
        rows = [("a", t, float(y[t]), float(X[t, 0]), float(X[t, 1]))
                for t in range(n)]
        df = spark.createDataFrame(
            rows, "unique_id string, ds long, y double, x1 double, x2 double")
        sf = SparkForecast([LinearRegression()], freq=1)
        states = sf.fit(df)
        fut = [("a", n + s, 1.0, 5.0) for s in range(2)]
        # x2 FIRST — permuted vs the fit-time (x1, x2) order
        X_perm = spark.createDataFrame(
            fut, "unique_id string, ds long, x2 double, x1 double")
        got = (sf.predict(states, h=2, X_df=X_perm).toPandas()
               .sort_values("ds")["LinearRegression"].to_numpy())
        # x2=1.0, x1=5.0 → 1 + 3·5 − 2·1 = 14
        np.testing.assert_allclose(got, np.full(2, 14.0), atol=0.5)

    def test_predict_missing_exog_column_raises(self, spark):
        from sparkts.kernels import LinearRegression

        rows = [("a", t, float(t), float(t % 3), float(t % 5))
                for t in range(30)]
        df = spark.createDataFrame(
            rows, "unique_id string, ds long, y double, x1 double, x2 double")
        sf = SparkForecast([LinearRegression()], freq=1)
        states = sf.fit(df)
        X_df = spark.createDataFrame([("a", 30, 1.0), ("a", 31, 1.0)],
                                     "unique_id string, ds long, x1 double")
        with pytest.raises(Exception, match="missing exog columns"):
            sf.predict(states, h=2, X_df=X_df).collect()

    def test_predict_exog_state_without_xdf_raises(self, spark):
        """ADVICE r3: a state fitted WITH exog, predicted without X_df,
        must raise a clear diagnostic — not be silently replaced by the
        fallback forecast."""
        from sparkts.kernels import ARIMA, Naive

        y, X = self._series(60)
        rows = [("a", t, float(y[t]), float(X[t, 0])) for t in range(60)]
        df = spark.createDataFrame(
            rows, "unique_id string, ds long, y double, x double")
        sf = SparkForecast([ARIMA((1, 0, 0), include_mean=False)], freq=1,
                           fallback_model=Naive())
        states = sf.fit(df)
        with pytest.raises(Exception, match="needs X_df"):
            sf.predict(states, h=2).collect()


class TestRegressorSurface:
    """Ridge / polynomial / duck-typed SklearnModel wrapper (reference
    models.py:6763 SklearnModel surface)."""

    def test_one_d_regressor_vector_is_a_column(self):
        """ADVICE r3: a 1-D regressor of length n must become an (n,1)
        design column (the old transpose guard was dead code and produced
        a 1-row design)."""
        from sparkts.kernels import LinearRegression, Ridge
        from sparkts.kernels.arima import _exog_design

        x = np.arange(10.0)
        assert _exog_design(x).shape == (10, 2)
        m = LinearRegression()
        assert m._design(x).shape == (10, 2)
        y = 2 * x + 1
        res = m.forecast(y, 2, X=x, X_future=np.array([10.0, 11.0]))
        np.testing.assert_allclose(res["mean"], [21.0, 23.0], atol=1e-8)
        with pytest.raises(ValueError, match="rows"):
            Ridge()._forecast_exog(y[:5], 2, False, x,
                                   np.array([10.0, 11.0]))

    def _xy(self, n=60, seed=4):
        rng = np.random.default_rng(seed)
        X = rng.normal(0, 1, (n, 2))
        y = 1.0 + 3.0 * X[:, 0] - 2.0 * X[:, 1] + rng.normal(0, 0.1, n)
        return y, X

    def test_ridge_shrinks_toward_zero(self):
        from sparkts.kernels import LinearRegression, Ridge

        y, X = self._xy()
        Xf = np.zeros((2, 2))
        ols = LinearRegression().forecast(y, 2, X=X, X_future=Xf)
        big = Ridge(alpha=1e6).forecast(y, 2, X=X, X_future=Xf)
        small = Ridge(alpha=1e-9).forecast(y, 2, X=X, X_future=Xf)
        # alpha→0 converges to OLS; huge alpha pins slopes → prediction at
        # X=0 approaches the data mean (intercept unpenalized)
        np.testing.assert_allclose(small["mean"], ols["mean"], rtol=1e-6)
        assert abs(big["mean"][0] - y.mean()) < 0.2

    def test_polynomial_fits_quadratic(self):
        from sparkts.kernels import PolynomialRegression

        rng = np.random.default_rng(5)
        x = rng.uniform(-2, 2, 80)
        y = 2.0 + 0.5 * x + 1.5 * x * x + rng.normal(0, 0.05, 80)
        Xf = np.array([[1.0], [2.0]])
        res = PolynomialRegression(degree=2).forecast(
            y, 2, X=x.reshape(-1, 1), X_future=Xf)
        np.testing.assert_allclose(res["mean"], [4.0, 9.0], atol=0.2)

    def test_sklearn_wrapper_duck_type(self):
        from sparkts.kernels import SklearnModel
        from sparkts.kernels.base import ConformalIntervals

        class MeanReg:  # minimal sklearn duck type
            def __init__(self, bias=0.0):
                self.bias = bias
                self.mu = 0.0

            def get_params(self):
                return {"bias": self.bias}

            def fit(self, X, y):
                self.mu = float(np.mean(y))
                return self

            def predict(self, X):
                return np.full(len(X), self.mu + self.bias)

        y, X = self._xy()
        m = SklearnModel(MeanReg(), prediction_intervals=ConformalIntervals(
            n_windows=2, h=2))
        res = m.forecast(y, 2, X=X, X_future=np.zeros((2, 2)), level=[80])
        np.testing.assert_allclose(res["mean"], np.full(2, y.mean()))
        assert np.all(res["lo-80"] <= res["mean"])
        # forward reuses the fitted mu (trained on the first half only)
        state = m.fit_state(y[:30], X[:30])
        fwd = m.forward(state, y[:30], 2, X=X[:30], X_future=np.zeros((2, 2)))
        np.testing.assert_allclose(fwd["mean"], np.full(2, y[:30].mean()))

    def test_sklearn_wrapper_rejects_non_regressor(self):
        from sparkts.kernels import SklearnModel

        with pytest.raises(TypeError):
            SklearnModel(object())

    def test_ridge_in_engine(self, spark):
        from sparkts.kernels import Ridge

        y, X = self._xy(50)
        rows = [("a", t, float(y[t]), float(X[t, 0]), float(X[t, 1]))
                for t in range(50)]
        df = spark.createDataFrame(
            rows, "unique_id string, ds long, y double, x1 double, x2 double")
        fut = [("a", 50 + s, 1.0, -1.0) for s in range(2)]
        X_df = spark.createDataFrame(
            fut, "unique_id string, ds long, x1 double, x2 double")
        out = SparkForecast([Ridge(alpha=0.1)], freq=1).forecast(
            df, h=2, X_df=X_df).toPandas()
        # beta ≈ (1, 3, −2) → prediction ≈ 1 + 3 + 2 = 6
        assert abs(out["Ridge"].iloc[0] - 6.0) < 0.5

    def test_cv_arima_exog_refit_modes(self, spark):
        """cv threads the panel's regressors into ARIMA-xreg in BOTH refit
        modes; refit=False re-applies the stored beta+coefs via forward."""
        from sparkts.kernels import ARIMA

        y, X = TestArimaExog()._series(90)
        rows = [("a", t, float(y[t]), float(X[t, 0])) for t in range(90)]
        df = spark.createDataFrame(
            rows, "unique_id string, ds long, y double, x double")
        sf = SparkForecast([ARIMA((1, 0, 0), include_mean=False)], freq=1)
        for refit in (True, False):
            out = sf.cross_validation(
                df, h=5, n_windows=2, step_size=5, refit=refit).toPandas()
            assert len(out) == 10
            # with beta ≈ (5, 2) and x ~ N(10, 2), predictions track y's
            # level (~25), far from the ~0 an exog-blind ARIMA(1,0,0)
            # without mean would decay to
            assert np.all(np.abs(out["ARIMA"] - y.mean()) < 12), refit
