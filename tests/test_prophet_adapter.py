"""AutoARIMAProphet facade: Prophet API surface over AutoARIMA
(reference adapters/prophet.py:34-262), prophet-free."""

import numpy as np
import pandas as pd
import pytest

from sparkts.kernels.prophet_adapter import AutoARIMAProphet


@pytest.fixture
def daily_df():
    ds = pd.date_range("2025-01-01", periods=120, freq="D")
    rng = np.random.default_rng(0)
    y = 50 + 0.2 * np.arange(120) + 5 * np.sin(2 * np.pi * np.arange(120) / 7)
    return pd.DataFrame({"ds": ds, "y": y + rng.normal(0, 0.5, 120)})


def test_fit_predict_surface(daily_df):
    m = AutoARIMAProphet(season_length=7).fit(daily_df)
    future = m.make_future_dataframe(periods=14)
    out = m.predict(future)
    assert list(out.columns) == ["ds", "yhat", "yhat_lower", "yhat_upper"]
    assert len(out) == 14
    assert (out["yhat_lower"] <= out["yhat"]).all()
    assert (out["yhat"] <= out["yhat_upper"]).all()
    # trend continues upward
    assert out["yhat"].iloc[-1] > daily_df["y"].iloc[:30].mean()


def test_holiday_regressors(daily_df):
    hol = pd.DataFrame({"holiday": ["promo"] * 4,
                        "ds": pd.to_datetime(
                            ["2025-01-10", "2025-02-10", "2025-03-10",
                             "2025-05-10"])})
    df = daily_df.copy()
    promo_days = df["ds"].isin(hol["ds"])
    df.loc[promo_days, "y"] += 30.0  # big holiday bump
    m = AutoARIMAProphet(season_length=7, holidays=hol).fit(df)
    fut = pd.DataFrame({"ds": pd.date_range("2025-05-01", periods=14, freq="D")})
    out = m.predict(fut)
    bump = out.loc[fut["ds"] == "2025-05-10", "yhat"].iloc[0]
    other = out.loc[fut["ds"] == "2025-05-09", "yhat"].iloc[0]
    assert bump - other > 15  # holiday effect recovered


def test_extra_regressor(daily_df):
    df = daily_df.copy()
    rng = np.random.default_rng(1)
    df["x"] = rng.normal(0, 1, len(df))
    df["y"] = df["y"] + 4.0 * df["x"]
    m = AutoARIMAProphet(season_length=7).add_regressor("x").fit(df)
    fut = m.make_future_dataframe(periods=5)
    fut["x"] = [1.0, -1.0, 0.0, 2.0, 0.0]
    out = m.predict(fut)
    # x=+1 vs x=-1 adjacent days differ by ~2*beta=8
    assert out["yhat"].iloc[0] - out["yhat"].iloc[1] == pytest.approx(8.0, abs=2.5)


def test_predict_with_history_returns_fitted():
    # Prophet semantics: include_history=True rows get in-sample yhat,
    # not h-step forecasts mislabeled with historical ds
    import numpy as np
    import pandas as pd
    from sparkts.kernels.prophet_adapter import AutoARIMAProphet

    rng = np.random.default_rng(0)
    ds = pd.date_range("2024-01-01", periods=100, freq="D")
    y = 10 + np.cumsum(rng.normal(0, 1, 100))
    m = AutoARIMAProphet().fit(pd.DataFrame({"ds": ds, "y": y}))
    out = m.predict(m.make_future_dataframe(12, include_history=True))
    assert len(out) == 112
    hist = out.iloc[:100]
    # fitted values track the history closely (AR fit), unlike a flat
    # h=112 forecast would
    err = np.abs(hist["yhat"].to_numpy()[5:] - y[5:])
    assert np.nanmean(err) < 3.0
    # future block is the 12-step forecast
    fut = out.iloc[100:]
    assert fut["ds"].iloc[0] == ds[-1] + pd.Timedelta(days=1)
    assert np.all(np.isfinite(fut["yhat"]))
