"""Per-model efficiency sweep (reference action_files/test_efficiency.py:
forecast a ~200-pt seasonal series, h=48, across every model class).

Bounds are loose (the sandbox VM is multi-tenant) — the point is (a) every
model in the zoo completes the reference's benchmark shape, and (b) gross
regressions (e.g. an accidentally O(n²) kernel) fail loudly.
"""

import time

import numpy as np
import pytest

from sparkts import kernels as K

rng = np.random.default_rng(7)
_t = np.arange(200)
Y = 50 + 0.1 * _t + 10 * np.sin(2 * np.pi * _t / 12) + rng.normal(0, 1, 200)
Y_POS = np.abs(Y) + 1.0
Y_INTERMITTENT = (rng.random(200) < 0.3) * rng.poisson(5, 200).astype(float)

H = 48

#: model factory → (input series, time bound in seconds)
CASES = {
    "Naive": (lambda: K.Naive(), Y, 1),
    "SeasonalNaive": (lambda: K.SeasonalNaive(12), Y, 1),
    "HistoricAverage": (lambda: K.HistoricAverage(), Y, 1),
    "WindowAverage": (lambda: K.WindowAverage(12), Y, 1),
    "SeasonalWindowAverage": (lambda: K.SeasonalWindowAverage(12, 2), Y, 1),
    "RandomWalkWithDrift": (lambda: K.RandomWalkWithDrift(), Y, 1),
    "SES": (lambda: K.SimpleExponentialSmoothing(0.3), Y, 1),
    "SESOpt": (lambda: K.SimpleExponentialSmoothingOptimized(), Y, 1),
    "SeasonalES": (lambda: K.SeasonalExponentialSmoothing(12, 0.3), Y, 1),
    "SeasonalESOpt": (lambda: K.SeasonalExponentialSmoothingOptimized(12), Y, 2),
    "CrostonClassic": (lambda: K.CrostonClassic(), Y_INTERMITTENT, 1),
    "CrostonOptimized": (lambda: K.CrostonOptimized(), Y_INTERMITTENT, 2),
    "CrostonSBA": (lambda: K.CrostonSBA(), Y_INTERMITTENT, 1),
    "ADIDA": (lambda: K.ADIDA(), Y_INTERMITTENT, 2),
    "IMAPA": (lambda: K.IMAPA(), Y_INTERMITTENT, 3),
    "TSB": (lambda: K.TSB(0.2, 0.2), Y_INTERMITTENT, 1),
    "Theta": (lambda: K.Theta(12), Y_POS, 3),
    "OptimizedTheta": (lambda: K.OptimizedTheta(12), Y_POS, 5),
    "DynamicTheta": (lambda: K.DynamicTheta(12), Y_POS, 3),
    "DynamicOptimizedTheta": (lambda: K.DynamicOptimizedTheta(12), Y_POS, 5),
    "AutoTheta": (lambda: K.AutoTheta(12), Y_POS, 10),
    "AutoETS": (lambda: K.AutoETS(12), Y_POS, 30),
    "Holt": (lambda: K.Holt(), Y, 10),
    "HoltWinters": (lambda: K.HoltWinters(12), Y_POS, 20),
    "AutoARIMA": (lambda: K.AutoARIMA(12), Y, 60),
    "ARIMA": (lambda: K.ARIMA((1, 1, 1)), Y, 10),
    "AutoRegressive": (lambda: K.AutoRegressive(3), Y, 10),
    "AutoCES": (lambda: K.AutoCES(12), Y, 20),
    "MSTL": (lambda: K.MSTL(12), Y, 20),
    "AutoTBATS": (lambda: K.AutoTBATS(12), Y_POS, 60),
    "MFLES": (lambda: K.MFLES(12), Y, 5),
    "AutoMFLES": (lambda: K.AutoMFLES(12, test_size=24), Y, 30),
    "GARCH": (lambda: K.GARCH(1, 1), Y - Y.mean(), 30),
    "ARCH": (lambda: K.ARCH(1), Y - Y.mean(), 15),
    "LocalLevel": (lambda: K.LocalLevel(), Y, 15),
    "LocalLinearTrend": (lambda: K.LocalLinearTrend(), Y, 20),
    "SmoothTrend": (lambda: K.SmoothTrend(), Y, 15),
    "ConformalSeasonalPool": (lambda: K.ConformalSeasonalPool(12), Y, 2),
    "ConstantModel": (lambda: K.ConstantModel(1.0), Y, 1),
    "ZeroModel": (lambda: K.ZeroModel(), Y, 1),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_model_efficiency(name):
    factory, y, bound = CASES[name]
    model = factory()
    t0 = time.perf_counter()
    res = model.forecast(np.asarray(y, dtype=np.float64), H)
    wall = time.perf_counter() - t0
    assert len(res["mean"]) == H
    assert np.all(np.isfinite(res["mean"])) or name == "NaNModel"
    if wall >= bound:
        # co-tenant stalls make single measurements flaky on this VM; a
        # genuine complexity regression fails the retry too
        t0 = time.perf_counter()
        model.forecast(np.asarray(y, dtype=np.float64), H)
        wall = min(wall, time.perf_counter() - t0)
    assert wall < bound, f"{name} took {wall:.2f}s (bound {bound}s)"
