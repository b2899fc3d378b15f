"""Conformal intervals + simulation: kernel-level (pure numpy) and
engine-level (Spark) checks. Mirrors the reference's conformal tests
(reference tests/test_core.py:755,1229) and simulation determinism tests
(tests/test_simulation.py)."""

import numpy as np
import pytest

from sparkts.kernels import ConformalIntervals, Naive, SeasonalNaive, WindowAverage
from sparkts.kernels.base import _conformal_scores, conformal_intervals


@pytest.fixture
def y():
    rng = np.random.default_rng(0)
    t = np.arange(120)
    return 50 + 5 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 1, t.size)


class TestConformal:
    def test_scores_shape_and_semantics(self, y):
        m = Naive()
        cs = _conformal_scores(m, y, h=6, n_windows=3)
        assert cs.shape == (3, 6)
        # window 0 trains on y[:n-18]; score = |last_train - actual|
        n = y.size
        expect = np.abs(y[n - 18 - 1] - y[n - 18 : n - 12])
        np.testing.assert_allclose(cs[0], expect)

    def test_conformal_on_model_without_native_intervals(self, y):
        m = WindowAverage(window_size=12)
        with pytest.raises(ValueError):
            m.forecast(y, 6, level=[90])  # only_conformal_intervals
        m.prediction_intervals = ConformalIntervals(n_windows=3, h=6)
        r = m.forecast(y, 6, level=[80, 95])
        assert np.all(r["lo-95"] <= r["lo-80"])
        assert np.all(r["lo-80"] <= r["mean"] + 1e-9)
        assert np.all(r["mean"] - 1e-9 <= r["hi-80"])
        assert np.all(r["hi-80"] <= r["hi-95"])

    def test_conformal_error_method(self, y):
        m = SeasonalNaive(12)
        m.prediction_intervals = ConformalIntervals(n_windows=4, h=6,
                                                    method="conformal_error")
        r = m.forecast(y, 6, level=[90])
        # symmetric around mean by construction
        np.testing.assert_allclose(r["mean"] - r["lo-90"], r["hi-90"] - r["mean"])

    def test_distribution_method_quantile_math(self):
        res = {"mean": np.array([10.0, 20.0])}
        cs = np.array([[1.0, 2.0], [3.0, 6.0]])
        conformal_intervals(res, cs, [50], "conformal_distribution")
        # paths at h0: {9,7,11,13} → 25%/75% quantiles
        assert res["lo-50"][0] == pytest.approx(np.quantile([9, 7, 11, 13], 0.25))
        assert res["hi-50"][0] == pytest.approx(np.quantile([9, 7, 11, 13], 0.75))

    def test_too_short_raises(self, y):
        m = Naive()
        with pytest.raises(ValueError):
            _conformal_scores(m, y[:10], h=6, n_windows=2)

    def test_config_validation(self):
        with pytest.raises(ValueError):
            ConformalIntervals(n_windows=1)
        with pytest.raises(ValueError):
            ConformalIntervals(method="bogus")


class TestSimulate:
    def test_shape_and_determinism(self, y):
        m = SeasonalNaive(12)
        p1 = m.simulate(y, 6, n_paths=50, seed=42)
        p2 = m.simulate(y, 6, n_paths=50, seed=42)
        assert p1.shape == (50, 6)
        np.testing.assert_array_equal(p1, p2)
        p3 = m.simulate(y, 6, n_paths=50, seed=43)
        assert not np.array_equal(p1, p3)

    def test_paths_center_on_mean(self, y):
        m = SeasonalNaive(12)
        mean = m.forecast(y, 6)["mean"]
        paths = m.simulate(y, 6, n_paths=4000, seed=1)
        np.testing.assert_allclose(paths.mean(axis=0), mean, atol=0.15)

    def test_bootstrap_and_laplace(self, y):
        m = Naive()
        for dist in ("bootstrap", "laplace", "t", "skew-normal", "ged"):
            p = m.simulate(y, 4, n_paths=20, seed=5, error_dist=dist)
            assert p.shape == (20, 4)
            assert np.all(np.isfinite(p))
        with pytest.raises(ValueError):
            m.simulate(y, 4, error_dist="cauchy")

    def test_naive_variance_grows_linearly(self):
        # random-walk recursion: Var(y_{T+i}) = i·σ² (reference
        # models.py:3539-3553) — the round-1 iid implementation was flat
        rng = np.random.default_rng(0)
        y = np.cumsum(rng.normal(0, 1, 400))
        paths = Naive().simulate(y, 8, n_paths=6000, seed=2)
        v = paths.var(axis=0)
        ratio = v[7] / v[0]
        assert 6.0 < ratio < 10.5  # ≈ 8

    def test_seasonal_naive_variance_steps_by_season(self):
        rng = np.random.default_rng(1)
        m = 4
        y = np.tile([10.0, 20.0, 15.0, 5.0], 50) + rng.normal(0, 1, 200)
        paths = SeasonalNaive(m).simulate(y, 12, n_paths=6000, seed=3)
        v = paths.var(axis=0)
        # steps 1-4 have 1 accumulated error, 5-8 have 2, 9-12 have 3
        assert v[:4].mean() == pytest.approx(v[4:8].mean() / 2, rel=0.25)
        assert v[:4].mean() == pytest.approx(v[8:].mean() / 3, rel=0.25)

    def test_rwd_variance_and_drift(self):
        rng = np.random.default_rng(2)
        y = np.cumsum(0.5 + rng.normal(0, 1, 300))
        from sparkts.kernels.basic import RandomWalkWithDrift
        paths = RandomWalkWithDrift().simulate(y, 10, n_paths=6000, seed=4)
        v = paths.var(axis=0)
        assert 7.0 < v[9] / v[0] < 13.5  # ≈ 10
        slope = np.diff(paths.mean(axis=0)).mean()
        assert 0.3 < slope < 0.7

    def test_ses_variance_matches_sigmah(self):
        from sparkts.kernels.smoothing import SimpleExponentialSmoothing
        rng = np.random.default_rng(3)
        y = 10 + rng.normal(0, 2, 300)
        m = SimpleExponentialSmoothing(0.4)
        paths = m.simulate(y, 10, n_paths=8000, seed=5)
        res = m.forecast(y, 10, level=[95])
        sigmah = (res["hi-95"] - res["mean"]) / 1.959964
        np.testing.assert_allclose(paths.std(axis=0), sigmah, rtol=0.1)

    def test_arima_simulate_recursion(self):
        from sparkts.kernels.arima import ARIMA
        rng = np.random.default_rng(6)
        n = 300
        y = np.zeros(n)
        for t in range(1, n):
            y[t] = 0.8 * y[t - 1] + rng.normal()
        m = ARIMA((1, 0, 0), include_mean=True)
        paths = m.simulate(y, 12, n_paths=6000, seed=7)
        res = m.forecast(y, 12, level=[95])
        sigmah = (res["hi-95"] - res["mean"]) / 1.959964
        np.testing.assert_allclose(paths.std(axis=0), sigmah, rtol=0.12)
        np.testing.assert_allclose(paths.mean(axis=0), res["mean"], atol=0.12)

    def test_ets_simulate_recursion(self):
        # path std must track the model's own class-1 variance formula
        # (which grows with α, β through the state recursion)
        from sparkts.kernels.ets import ETS
        rng = np.random.default_rng(8)
        y = np.cumsum(rng.normal(0.2, 2, 300))  # RW-ish → large fitted alpha
        m = ETS(model="AAN")
        paths = m.simulate(y, 10, n_paths=8000, seed=9)
        assert paths.shape == (8000, 10)
        res = m.forecast(y, 10, level=[95])
        sigmah = (res["hi-95"] - res["mean"]) / 1.959964
        np.testing.assert_allclose(paths.mean(axis=0), res["mean"], atol=0.5)
        np.testing.assert_allclose(paths.std(axis=0), sigmah, rtol=0.12)
        assert sigmah[9] > sigmah[0] * 1.5  # variance genuinely grows here


class TestSampleErrors:
    def test_moments(self):
        from sparkts.kernels.base import sample_errors
        rng = np.random.default_rng(0)
        resid = rng.normal(0, 2.0, 500)
        for dist in ("normal", "t", "laplace", "skew-normal", "ged"):
            e = sample_errors((200, 200), 2.0, dist, None, resid,
                              np.random.default_rng(1))
            # auto-fit centers on the residual mean (≈0 here, tolerance
            # covers the fitted-loc shift) and matches the residual scale
            assert abs(float(e.mean())) < 0.25
            # laplace MLE matches the L1 scale, not variance → wider band
            assert float(e.std()) == pytest.approx(2.0, rel=0.15)

    def test_explicit_params(self):
        from sparkts.kernels.base import sample_errors
        e = sample_errors((100, 100), 1.5, "t", {"df": 6}, None,
                          np.random.default_rng(2))
        assert float(e.std()) == pytest.approx(1.5, rel=0.1)
        e = sample_errors((100, 100), 1.5, "ged", {"shape": 1.0}, None,
                          np.random.default_rng(3))
        assert float(e.std()) == pytest.approx(1.5, rel=0.1)
        with pytest.raises(ValueError):
            sample_errors((2, 2), 1.0, "t", {"df": 1.5}, None)
        with pytest.raises(ValueError):
            sample_errors((2, 2), 1.0, "bootstrap", None, None)

    def test_skewnorm_skewness_recovered(self):
        from sparkts.kernels.base import sample_errors
        rng = np.random.default_rng(4)
        # strongly right-skewed residuals
        resid = rng.gamma(2.0, 1.0, 2000) - 2.0
        e = sample_errors(200_000, 1.0, "skew-normal", None, resid,
                          np.random.default_rng(5))
        g1 = float(np.mean((e - e.mean()) ** 3) / e.std() ** 3)
        assert g1 > 0.3  # skew direction and rough magnitude preserved


@pytest.mark.usefixtures("spark")
class TestEngineSimulate:
    def test_simulate_partition_independent(self, spark, panel_df):
        from sparkts.engine import SparkForecast

        eng = SparkForecast([Naive(), SeasonalNaive(24)], freq="h")
        out1 = (eng.simulate(panel_df.repartition(1), h=4, n_paths=3, seed=7)
                .toPandas().sort_values(["unique_id", "sample_id", "ds"])
                .reset_index(drop=True))
        out16 = (eng.simulate(panel_df.repartition(16), h=4, n_paths=3, seed=7)
                 .toPandas().sort_values(["unique_id", "sample_id", "ds"])
                 .reset_index(drop=True))
        assert list(out1.columns) == ["unique_id", "ds", "sample_id",
                                      "Naive", "SeasonalNaive"]
        np.testing.assert_array_equal(out1["Naive"].to_numpy(),
                                      out16["Naive"].to_numpy())
        n_series = out1["unique_id"].nunique()
        assert len(out1) == n_series * 3 * 4
