import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkts.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sparkts-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def panel_df(spark):
    """Hourly (unique_id, ds, y) panel from the events testdata 1h tier."""
    from pyspark.sql import functions as F

    from sparkts.operators import rollup_base

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    tier = rollup_base(ev, "ts", ["event_type"], "value", "1h")
    return tier.select(
        F.col("event_type").alias("unique_id"),
        F.col("bucket").alias("ds"),
        F.col("v_sum").alias("y"),
    )
