"""Gap-fill: spine density, forward-fill, seasonal-naive fill semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkts.operators import calendar_spine, gap_fill, rollup_base


@pytest.fixture(scope="module")
def hourly(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return rollup_base(ev, "ts", ["event_type"], "value", "1h")


def _mk(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "bucket", "v"])
    pdf["bucket"] = pd.to_datetime(pdf["bucket"])
    return spark.createDataFrame(pdf)


def test_spine_is_dense(spark, hourly):
    spine = calendar_spine(hourly, ["event_type"], "bucket", 3600)
    g = spine.groupBy("event_type").agg(
        F.count("*").alias("n"),
        ((F.max("bucket").cast("long") - F.min("bucket").cast("long")) / 3600 + 1).alias(
            "expected"
        ),
    )
    bad = g.where(F.col("n") != F.col("expected")).count()
    assert bad == 0


def test_forward_fill(spark):
    df = _mk(
        spark,
        [
            ("a", "2026-01-01 00:00", 1.0),
            ("a", "2026-01-01 02:00", 3.0),  # 01:00 missing
        ],
    )
    out = (
        gap_fill(df, ["k"], "bucket", ["v"], 3600)
        .orderBy("bucket")
        .toPandas()
    )
    assert out["v"].tolist() == [1.0, 1.0, 3.0]
    assert out["is_gap"].tolist() == [False, True, False]


def test_seasonal_fill_beats_ffill(spark):
    # season = 2 buckets; missing bucket at phase of the 10.0 values
    rows = [
        ("a", "2026-01-01 00:00", 10.0),
        ("a", "2026-01-01 01:00", 1.0),
        ("a", "2026-01-01 02:00", 10.0),
        ("a", "2026-01-01 03:00", 1.0),
        # 04:00 missing (same phase as 00/02 → seasonal fill = 10, ffill would give 1)
        ("a", "2026-01-01 05:00", 1.0),
    ]
    df = _mk(spark, rows)
    out = (
        gap_fill(df, ["k"], "bucket", ["v"], 3600, season_length=2)
        .orderBy("bucket")
        .toPandas()
    )
    assert out["v"].tolist() == [10.0, 1.0, 10.0, 1.0, 10.0, 1.0]


def test_zero_fill_counts(spark):
    df = _mk(spark, [("a", "2026-01-01 00:00", 2.0), ("a", "2026-01-01 02:00", 4.0)])
    df = df.withColumnRenamed("v", "n_rows")
    out = (
        gap_fill(df, ["k"], "bucket", value_cols=[], step_s=3600, zero_cols=["n_rows"])
        .orderBy("bucket")
        .toPandas()
    )
    assert out["n_rows"].tolist() == [2.0, 0.0, 4.0]


class TestPersistContract:
    """Round-2 fix: gap_fill reads its input twice (spine bounds + join
    probe); with an unpersisted computed input both consumers would
    recompute from raw. The operator must route them through a cache."""

    def test_auto_persist_routes_both_reads_through_cache(self, spark):
        import io
        from contextlib import redirect_stdout
        from sparkts.operators import gap_fill

        df = (spark.range(0, 100)
              .selectExpr("'k' as key", "timestamp_seconds(id * 3600) as bucket",
                          "cast(id as double) as v_sum")
              .where("id % 7 != 0"))  # gaps + a computed (non-scan) plan
        out = gap_fill(df, ["key"], "bucket", ["v_sum"], 3600)
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        p = buf.getvalue()
        assert "InMemoryTableScan" in p or "TableCacheQueryStage" in p
        assert out.count() == 99  # spine spans ids 1..99 (id 0 filtered)

    def test_persist_false_opts_out(self, spark):
        import io
        from contextlib import redirect_stdout
        from sparkts.operators import gap_fill

        df = (spark.range(0, 50)
              .selectExpr("'k' as key", "timestamp_seconds(id * 3600) as bucket",
                          "cast(id as double) as v_sum"))
        out = gap_fill(df, ["key"], "bucket", ["v_sum"], 3600, persist=False)
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        p = buf.getvalue()
        assert "InMemoryTableScan" not in p and "TableCacheQueryStage" not in p
