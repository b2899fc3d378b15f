"""MSTL decomposition feature frames (reference feature_engineering.py:19-69):
train components + future components in one kernel pass."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkts.kernels import MSTL
from sparkts.operators import mstl_decomposition, split_frames


@pytest.fixture(scope="module")
def seasonal_panel(spark):
    import pandas as pd

    frames = []
    for uid in ("a", "b"):
        t = np.arange(120)
        y = 10 + 0.2 * t + 4 * np.sin(2 * np.pi * t / 12) + (uid == "b") * 5
        frames.append(pd.DataFrame({
            "unique_id": uid,
            "ds": pd.date_range("2025-01-01", periods=120, freq="D"),
            "y": y,
        }))
    return spark.createDataFrame(pd.concat(frames))


def test_decomposition_frames(spark, seasonal_panel):
    tagged = mstl_decomposition(seasonal_panel, MSTL(12), freq="D", h=6)
    train, future = split_frames(tagged)
    tr = train.toPandas()
    fu = future.toPandas()
    assert set(tr.columns) == {"unique_id", "ds", "y", "trend", "seasonal"}
    assert set(fu.columns) == {"unique_id", "ds", "trend", "seasonal"}
    assert len(tr) == 240 and len(fu) == 12
    a = tr[tr.unique_id == "a"].sort_values("ds")
    # identity: y == trend + seasonal + remainder → |y - trend - seasonal| small
    resid = a["y"] - a["trend"] - a["seasonal"]
    assert resid.abs().mean() < 0.5
    # future timestamps continue the train grid
    fa = fu[fu.unique_id == "a"].sort_values("ds")
    assert str(fa["ds"].iloc[0])[:10] == "2025-05-01"
    # future seasonal tiles the last cycle
    last_cycle = a["seasonal"].to_numpy()[-12:]
    np.testing.assert_allclose(fa["seasonal"].to_numpy(), last_cycle[:6],
                               atol=1e-9)


def test_tagged_union_single_pass(spark, seasonal_panel):
    tagged = mstl_decomposition(seasonal_panel, MSTL(12), freq="D", h=3)
    counts = {r["frame"]: r["count"] for r in
              tagged.groupBy("frame").count().collect()}
    assert counts == {"train": 240, "future": 6}
