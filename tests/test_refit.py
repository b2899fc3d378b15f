"""cross_validation refit semantics + the forward contract
(reference core.py:322-354; validation core.py:1188-1200)."""

import numpy as np
import pytest

from sparkts.engine import SparkForecast
from sparkts.kernels import (
    ARIMA,
    AutoCES,
    AutoETS,
    Naive,
    SimpleExponentialSmoothing,
    SimpleExponentialSmoothingOptimized,
)


@pytest.fixture(scope="module")
def y():
    rng = np.random.default_rng(0)
    t = np.arange(200)
    return 30 + 0.1 * t + 5 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 1, 200)


class TestForwardContract:
    def test_sesopt_forward_reuses_alpha(self, y):
        m = SimpleExponentialSmoothingOptimized()
        state = m.fit_state(y[:150])
        fwd = m.forward(state, y[:150], 5)
        ref = SimpleExponentialSmoothing(state["alpha"]).forecast(y[:150], 5)
        np.testing.assert_allclose(fwd["mean"], ref["mean"])

    def test_autoets_forward_matches_spec(self, y):
        m = AutoETS(12)
        state = m.fit_state(y)
        fwd = m.forward(state, y, 6)
        full = m.forecast(y, 6)
        # same data, same params → forward ≈ fresh fit (init-state heuristic
        # identical; optimizer refinement is the only difference)
        np.testing.assert_allclose(fwd["mean"], full["mean"], rtol=0.25, atol=3.0)

    def test_arima_forward_reapplies_coefs(self, y):
        m = ARIMA((1, 0, 0), include_mean=True)
        state = m.fit_state(y[:150])
        fwd = m.forward(state, y, 4)  # longer series, fixed coefs
        assert np.all(np.isfinite(fwd["mean"]))
        # forecast stays inside the data's range (mean-reverting AR(1))
        assert y.min() - 5 < fwd["mean"][0] < y.max() + 5
        # and the state's coefficients were reused, not re-estimated
        state2 = m.fit_state(y)
        assert not np.array_equal(state["coef"], state2["coef"])

    def test_parameter_free_forward_is_forecast(self, y):
        m = Naive()
        state = m.fit_state(y)
        assert state is None
        np.testing.assert_allclose(m.forward(None, y, 3)["mean"],
                                   m.forecast(y, 3)["mean"])

    def test_tunable_without_forward_raises(self, y):
        m = AutoCES(12)
        with pytest.raises(NotImplementedError):
            m.fit_state(y)


class TestCvRefit:
    @pytest.fixture(scope="class")
    def panel(self, spark):
        import pandas as pd

        rng = np.random.default_rng(1)
        frames = []
        for uid in ("a", "b"):
            t = np.arange(150)
            yv = 20 + 0.05 * t + 3 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 0.5, 150)
            frames.append(pd.DataFrame({
                "unique_id": uid,
                "ds": pd.date_range("2025-01-01", periods=150, freq="D"),
                "y": yv}))
        return spark.createDataFrame(pd.concat(frames))

    def test_refit_false_runs_and_matches_shape(self, spark, panel):
        eng = SparkForecast([SimpleExponentialSmoothingOptimized(), Naive()],
                            freq="D")
        out_t = eng.cross_validation(panel, h=6, n_windows=3, step_size=6,
                                     refit=True).toPandas()
        out_f = eng.cross_validation(panel, h=6, n_windows=3, step_size=6,
                                     refit=False).toPandas()
        assert out_t.shape == out_f.shape
        # Naive is parameter-free: identical under both modes
        np.testing.assert_allclose(
            out_t.sort_values(["unique_id", "cutoff", "ds"])["Naive"].to_numpy(),
            out_f.sort_values(["unique_id", "cutoff", "ds"])["Naive"].to_numpy())

    def test_refit_int(self, spark, panel):
        eng = SparkForecast([SimpleExponentialSmoothingOptimized()], freq="D")
        out = eng.cross_validation(panel, h=6, n_windows=4, step_size=6,
                                   refit=2).toPandas()
        assert len(out) == 2 * 4 * 6

    def test_refit_false_requires_forward(self, spark, panel):
        eng = SparkForecast([AutoCES(12)], freq="D")
        with pytest.raises(ValueError, match="forward"):
            eng.cross_validation(panel, h=6, n_windows=2, refit=False)
