"""Salted two-stage rollup == direct rollup (decomposable-stat invariant),
and the skew profiler surfaces the Zipf head."""

import pytest
from pyspark.sql import functions as F

from sparkts.operators import rollup_base, salted_rollup_base, key_skew_profile


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_salted_equals_direct(spark, events):
    direct = rollup_base(events, "ts", ["event_type"], "value", "1h")
    salted = salted_rollup_base(events, "ts", ["event_type"], "value", "1h",
                                n_salts=7)
    d = (direct.toPandas().sort_values(["event_type", "bucket"])
         .reset_index(drop=True))
    s = (salted.toPandas().sort_values(["event_type", "bucket"])
         .reset_index(drop=True))
    assert len(d) == len(s) and len(d) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(d, s, check_exact=False, rtol=1e-12)


def test_salted_deterministic_under_retry(spark, events):
    # same input, different partitioning → identical result (idempotent salt)
    a = salted_rollup_base(events.repartition(3), "ts", ["event_type"],
                           "value", "1h").agg(F.sum("v_sum")).collect()[0][0]
    b = salted_rollup_base(events.repartition(11), "ts", ["event_type"],
                           "value", "1h").agg(F.sum("v_sum")).collect()[0][0]
    assert a == pytest.approx(b, rel=1e-12)


def test_skew_profile(spark):
    from sparkts.datagen import web_pages

    pages = web_pages(spark, 20000, n_domains=50, partitions=4)
    prof = key_skew_profile(
        pages.select(F.parse_url("url", F.lit("HOST")).alias("domain")),
        ["domain"], top_n=5).toPandas()
    assert len(prof) == 5
    # Zipf head: top domain holds a disproportionate share
    assert prof["share"].iloc[0] > 0.05
    assert prof["n_rows"].is_monotonic_decreasing
