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
        for dist in ("bootstrap", "laplace"):
            p = m.simulate(y, 4, n_paths=20, seed=5, error_dist=dist)
            assert p.shape == (20, 4)
            assert np.all(np.isfinite(p))
        with pytest.raises(ValueError):
            m.simulate(y, 4, error_dist="cauchy")


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
