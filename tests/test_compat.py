"""Drop-in StatsForecast facade: reference-signature calls with pandas
frames must work unchanged (reference core.py:541/663/766/817/882)."""

import numpy as np
import pandas as pd
import pytest

from sparkts import StatsForecast
from sparkts.kernels import Naive, SeasonalNaive, SimpleExponentialSmoothingOptimized


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.default_rng(0)
    frames = []
    for uid in ("s1", "s2"):
        t = np.arange(60)
        y = 10 + 0.1 * t + 3 * np.sin(2 * np.pi * t / 7) + rng.normal(0, 0.3, 60)
        frames.append(pd.DataFrame({
            "unique_id": uid,
            "ds": pd.date_range("2025-01-01", periods=60, freq="D"),
            "y": y}))
    return pd.concat(frames, ignore_index=True)


def test_reference_style_forecast_pandas_in_pandas_out(spark, pdf):
    sf = StatsForecast(models=[Naive(), SeasonalNaive(7)], freq="D", n_jobs=-1)
    out = sf.forecast(df=pdf, h=7, level=[90])
    assert isinstance(out, pd.DataFrame)
    assert len(out) == 2 * 7
    for c in ("unique_id", "ds", "Naive", "SeasonalNaive",
              "SeasonalNaive-lo-90", "SeasonalNaive-hi-90"):
        assert c in out.columns


def test_reference_style_fit_predict_stateful(spark, pdf):
    sf = StatsForecast([SimpleExponentialSmoothingOptimized(), Naive()], freq="D")
    assert sf.fit(pdf) is sf  # chaining, reference contract
    out = sf.predict(h=5)
    assert isinstance(out, pd.DataFrame)
    assert len(out) == 10
    # predict == fit_predict == stateless forecast for these models
    fp = StatsForecast([SimpleExponentialSmoothingOptimized(), Naive()],
                       freq="D").fit_predict(pdf, h=5)
    a = out.sort_values(["unique_id", "ds"]).reset_index(drop=True)
    b = fp.sort_values(["unique_id", "ds"]).reset_index(drop=True)
    np.testing.assert_allclose(a["SESOpt"].to_numpy(), b["SESOpt"].to_numpy(),
                               rtol=1e-12)


def test_predict_before_fit_raises(spark):
    sf = StatsForecast([Naive()], freq="D")
    with pytest.raises(ValueError, match="fit before predict"):
        sf.predict(h=3)


def test_spark_frames_stay_spark(spark, pdf):
    from pyspark.sql import DataFrame as SparkDF

    sdf = spark.createDataFrame(pdf)
    sf = StatsForecast([Naive()], freq="D")
    out = sf.forecast(df=sdf, h=3)
    assert isinstance(out, SparkDF)
    cv = sf.cross_validation(df=sdf, h=5, n_windows=2, step_size=5)
    assert isinstance(cv, SparkDF)
    assert cv.count() == 2 * 2 * 5


def test_save_load_roundtrip(spark, pdf, tmp_path):
    """Reference save/load surface (core.py:1541/1631): a loaded facade
    predicts identically without refitting."""
    sf = StatsForecast([SimpleExponentialSmoothingOptimized(), Naive()],
                       freq="D").fit(pdf)
    want = sf.predict(h=4).sort_values(["unique_id", "ds"]).reset_index(drop=True)
    path = str(tmp_path / "sf_model")
    sf.save(path)
    back = StatsForecast.load(path)
    got = back.predict(h=4).sort_values(["unique_id", "ds"]).reset_index(drop=True)
    assert isinstance(got, pd.DataFrame)
    np.testing.assert_allclose(got["SESOpt"].to_numpy(),
                               want["SESOpt"].to_numpy(), rtol=1e-12)
    np.testing.assert_allclose(got["Naive"].to_numpy(),
                               want["Naive"].to_numpy(), rtol=1e-12)


def test_fit_prediction_intervals_kwarg(spark, pdf):
    """fit(prediction_intervals=...) mirrors the reference: conformal
    config attached to models lacking one; predict(level=...) then emits
    conformal bounds for a model with no native intervals."""
    from sparkts.kernels import CrostonClassic
    from sparkts.kernels.base import ConformalIntervals

    sf = StatsForecast([CrostonClassic()], freq="D")
    out = (sf.fit(pdf, prediction_intervals=ConformalIntervals(h=5))
           .predict(h=5, level=[80]))
    assert "CrostonClassic-lo-80" in out.columns
    assert (out["CrostonClassic-lo-80"] <= out["CrostonClassic"]).all()


def test_cross_validation_and_fitted_values_pandas(spark, pdf):
    sf = StatsForecast([Naive()], freq="D")
    cv = sf.cross_validation(df=pdf, h=5, n_windows=2, step_size=5)
    assert isinstance(cv, pd.DataFrame) and len(cv) == 20
    fv = sf.forecast_fitted_values(df=pdf)
    assert isinstance(fv, pd.DataFrame) and len(fv) == len(pdf)


def test_simulate_pandas_roundtrip(spark, pdf):
    sf = StatsForecast([Naive()], freq="D")
    out = sf.simulate(df=pdf, h=4, n_paths=3, seed=1)
    assert isinstance(out, pd.DataFrame)
    # 2 series x 4 steps x 3 paths
    assert len(out) == 2 * 4 * 3
    assert {"unique_id", "ds", "sample_id", "Naive"} <= set(out.columns)
    # deterministic under a repeat call
    out2 = sf.simulate(df=pdf, h=4, n_paths=3, seed=1)
    pd.testing.assert_frame_equal(
        out.sort_values(["unique_id", "ds", "sample_id"]).reset_index(drop=True),
        out2.sort_values(["unique_id", "ds", "sample_id"]).reset_index(drop=True))


def test_cross_validation_fitted_values_pandas_roundtrip(spark, pdf):
    sf = StatsForecast([Naive()], freq="D")
    out = sf.cross_validation_fitted_values(df=pdf, h=5, n_windows=2)
    assert isinstance(out, pd.DataFrame)
    assert {"unique_id", "ds", "cutoff", "y", "Naive"} <= set(out.columns)
    assert out["cutoff"].nunique() == 2


def test_polars_input_names_the_gap(spark, pdf):
    class _FakePolars:
        pass
    _FakePolars.__module__ = "polars.dataframe"
    with pytest.raises(TypeError, match="polars.*not supported"):
        StatsForecast([Naive()], freq="D").forecast(df=_FakePolars(), h=3)
