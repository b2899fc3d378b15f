"""Tier rollup: cascade invariant, DuckDB oracle, retention."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkts.operators import TIERS, apply_retention, build_tiers, rollup_base


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_base_rollup_matches_duckdb(spark, events, sf_dir):
    got = (
        rollup_base(events, "ts", ["event_type"], "value", "1h")
        .orderBy("event_type", "bucket")
        .toPandas()
    )
    exp = duckdb.sql(
        f"""
        SELECT event_type,
               date_trunc('hour', ts) AS bucket,
               count(value) AS n_rows, sum(value) AS v_sum,
               min(value) AS v_min, max(value) AS v_max,
               sum(value*value) AS v_sumsq
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    assert len(got) == len(exp)
    assert (got["n_rows"].to_numpy() == exp["n_rows"].to_numpy()).all()
    assert got["v_sum"].to_numpy() == pytest.approx(exp["v_sum"].to_numpy(), rel=1e-12)
    assert got["v_min"].to_numpy() == pytest.approx(exp["v_min"].to_numpy())
    assert got["v_max"].to_numpy() == pytest.approx(exp["v_max"].to_numpy())


def test_cascade_equals_direct(spark, events):
    """Continuous-aggregate invariant: 1m→5m→1h→1d cascade == direct rollup."""
    tiers = build_tiers(events, "ts", ["event_type"], "value")
    direct_1d = rollup_base(events, "ts", ["event_type"], "value", "1d")
    casc = tiers["1d"].orderBy("event_type", "bucket").toPandas()
    dire = direct_1d.orderBy("event_type", "bucket").toPandas()
    assert len(casc) == len(dire)
    assert (casc["n_rows"].to_numpy() == dire["n_rows"].to_numpy()).all()
    assert casc["v_sum"].to_numpy() == pytest.approx(dire["v_sum"].to_numpy(), rel=1e-9)
    assert casc["v_min"].to_numpy() == pytest.approx(dire["v_min"].to_numpy())
    assert casc["v_max"].to_numpy() == pytest.approx(dire["v_max"].to_numpy())
    assert casc["v_sumsq"].to_numpy() == pytest.approx(dire["v_sumsq"].to_numpy(), rel=1e-9)


def test_partitioning_invariance(spark, events):
    """Same result under different partitioning (action_files/test_spark.py pattern)."""
    a = (
        rollup_base(events.repartition(2), "ts", ["event_type"], "value", "1h")
        .orderBy("event_type", "bucket")
        .toPandas()
    )
    b = (
        rollup_base(events.repartition(16), "ts", ["event_type"], "value", "1h")
        .orderBy("event_type", "bucket")
        .toPandas()
    )
    assert (a["n_rows"].to_numpy() == b["n_rows"].to_numpy()).all()
    assert a["v_sum"].to_numpy() == pytest.approx(b["v_sum"].to_numpy(), rel=1e-12)


def test_retention(spark, events):
    tiers = build_tiers(events, "ts", ["event_type"], "value", tiers=["1h", "1d"])
    kept = apply_retention(
        {"1h": tiers["1h"]}, horizons={"1h": 86400}, as_of="2024-01-10 00:00:00"
    )["1h"]
    mn = kept.agg(F.min("bucket")).collect()[0][0]
    assert str(mn) >= "2024-01-09 00:00:00"
