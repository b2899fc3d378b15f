"""Custom stateful streaming operator: per-series SES anomaly flags.

The reference is batch-only; this is the north-rule streaming extension the
brief calls for (`applyInPandasWithState` for custom stateful operators):
each series carries a persistent (level, ewma of squared error, n) state
across micro-batches — exactly the SES recurrence the batch kernels use
(kernels/scan.py) — and every incoming point is flagged when its one-step
prediction error exceeds ``k``·sigma.

Scale design: state is three doubles per series key (bounded, no window
buffering); each micro-batch touches only the keys present in it; the state
store checkpoints with the query, so a restarted stream resumes the
recurrence mid-series (tested by running two availableNow passes over a
split input against one checkpoint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def stream_anomaly_flags(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    k: float = 3.0,
    min_obs: int = 10,
) -> DataFrame:
    """Streaming per-key anomaly flags via applyInPandasWithState.

    Output: (key, ts, y, level, sigma, is_anomaly) — ``level`` is the SES
    prediction BEFORE observing y (the one-step forecast), ``sigma`` the
    EWMA error scale; the first ``min_obs`` points per key are never
    flagged (state warm-up).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_field = stream_df.schema[key_col]
    ts_field = stream_df.schema[ts_col]
    out_schema = T.StructType([
        key_field,
        T.StructField(ts_col, ts_field.dataType, True),
        T.StructField(value_col, T.DoubleType(), True),
        T.StructField("level", T.DoubleType(), True),
        T.StructField("sigma", T.DoubleType(), True),
        T.StructField("is_anomaly", T.BooleanType(), True),
    ])
    state_schema = T.StructType([
        T.StructField("level", T.DoubleType(), True),
        T.StructField("var", T.DoubleType(), True),
        T.StructField("n", T.LongType(), True),
    ])

    def fn(key, pdf_iter, state: "GroupState"):
        level, var, n = state.get if state.exists else (0.0, 0.0, 0)
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col)
            y = pdf[value_col].to_numpy(dtype=np.float64)
            m = y.size
            lev_out = np.empty(m)
            sig_out = np.empty(m)
            flag = np.zeros(m, dtype=bool)
            for i in range(m):
                if n == 0:
                    lev_out[i] = y[i]
                    sig_out[i] = 0.0
                else:
                    lev_out[i] = level
                    e = y[i] - level
                    sig_out[i] = np.sqrt(var)
                    if n >= min_obs and var > 0:
                        flag[i] = abs(e) > k * np.sqrt(var)
                    var = (1 - alpha) * var + alpha * e * e
                level = alpha * y[i] + (1 - alpha) * level if n else y[i]
                n += 1
            yield pd.DataFrame({
                key_col: np.repeat(key[0], m),
                ts_col: pdf[ts_col].to_numpy(),
                value_col: y,
                "level": lev_out,
                "sigma": sig_out,
                "is_anomaly": flag,
            })
        state.update((float(level), float(var), int(n)))

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout)
    )
