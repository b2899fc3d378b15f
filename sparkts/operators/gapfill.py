"""Calendar spine + gap-fill (forward-fill and seasonal-naive interpolation).

The reference engine never forecasts at irregular timestamps — future grids
are generated from ``last_dates + freq`` (reference core.py:708-715). Rollup
tiers inherit the same discipline: before any per-series kernel runs, a tier
is densified onto a regular calendar spine, and missing buckets are filled.

The seasonal-naive interpolator mirrors the reference's ``_seasonal_naive``
kernel semantics (reference utils.py:231-261): the fill value for a missing
bucket is the most recent *observed* value at the same seasonal phase
(i.e. lag of season_length, skipping over other gaps); if no prior
observation exists at that phase the value stays null (the reference pads
partial seasons with NaN, utils.py:249-252) and the forward-fill / default
fallbacks take over.

All pure DataFrame ops — two window functions, no UDFs, one shuffle
(reused partitioning on the series keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.storagelevel import StorageLevel


def calendar_spine(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str = "bucket",
    step_s: int = 3600,
) -> DataFrame:
    """Dense per-key grid of buckets from each key's min to max bucket.

    ``sequence(min, max, interval)`` + ``explode`` — generated JVM-side.
    At 100 TB scale the spine is tiny relative to raw data (one row per
    key per bucket), and the groupBy reuses the tier's (keys) partitioning.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step_s} SECOND"))
            ).alias(bucket_col),
        )
    )


def gap_fill(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str = "bucket",
    value_cols: list[str] | None = None,
    step_s: int = 3600,
    season_length: int | None = None,
    zero_cols: list[str] | None = None,
    persist: bool | str = "auto",
) -> DataFrame:
    """Densify a tier onto the calendar spine and fill missing buckets.

    Fill order per value column (first non-null wins):
      1. the observed value;
      2. seasonal-naive: last observed value at the same seasonal phase
         (requires ``season_length``; semantics per reference utils.py:231-261);
      3. forward-fill (last observed value at any phase).
    Columns in ``zero_cols`` (e.g. counts) are filled with 0 instead —
    a missing crawl bucket genuinely means zero pages.

    Adds ``is_gap`` boolean. Output partitioned/sorted by (keys, bucket).

    Plan note: the input feeds TWO consumers (the spine bounds aggregation
    and the join probe). If the input is an unpersisted computed plan, both
    consumers recompute it from the raw source — at 100 TB that doubles the
    dominant scan. So by default (``persist="auto"``) the operator persists
    the input (MEMORY_AND_DISK) when it isn't already persisted; pass
    ``persist=False`` to opt out (e.g. when the input is a bare parquet
    tier read that is cheap to scan twice). The caller owns unpersist.
    The spine side broadcasts when small (AQE); at full scale it
    sort-merge-joins on the same (keys, bucket) the tier is clustered by.
    """
    value_cols = ["v_sum"] if value_cols is None else value_cols
    zero_cols = zero_cols or []
    if persist == "auto":
        persist = df.storageLevel == StorageLevel.NONE
    if persist:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    spine = calendar_spine(df, key_cols, bucket_col, step_s)
    joined = spine.join(df, on=[*key_cols, bucket_col], how="left")
    probe = value_cols[0] if value_cols else zero_cols[0]
    joined = joined.withColumn("is_gap", F.col(probe).isNull())

    w_ff = (
        W.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    phase = (F.col(bucket_col).cast("long") / step_s).cast("long") % F.lit(
        season_length or 1
    )
    w_seas = (
        W.partitionBy(*key_cols, phase)
        .orderBy(bucket_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )

    out = joined
    for c in value_cols:
        candidates = [F.col(c)]
        if season_length:
            candidates.append(F.last(c, ignorenulls=True).over(w_seas))
        candidates.append(F.last(c, ignorenulls=True).over(w_ff))
        out = out.withColumn(c, F.coalesce(*candidates))
    for c in zero_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0).cast("double")))
    return out
