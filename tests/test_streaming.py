"""Structured Streaming 1m tier: streaming result == batch rollup_base on
the same input (the streaming-equals-batch invariance the decomposable-stat
design guarantees)."""

import os

import pandas as pd
import pytest

from sparkts.operators import rollup_base
from sparkts.streaming import (
    read_tier_stream_output,
    stream_rollup,
    write_tier_stream,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    # re-lay the events table as a small multi-file dir (a file stream source)
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    d = str(tmp_path_factory.mktemp("stream_src"))
    src.repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_stream_rollup_equals_batch(spark, events_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tier_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # force >1 micro-batch
        .parquet(events_dir)
    )
    # files arrive in arbitrary event-time order (repartitioned), so the
    # watermark must cover the full span or genuinely-late rows get dropped
    tier = stream_rollup(stream, "ts", ["event_type"], "value", tier="1m",
                         watermark="365 days")
    q = write_tier_stream(tier, out, ckpt, available_now=True)
    q.awaitTermination(180)

    got = read_tier_stream_output(spark, out, ["event_type"])
    batch = rollup_base(
        spark.read.parquet(events_dir), "ts", ["event_type"], "value", "1m"
    )
    cols = ["event_type", "bucket", "n_rows", "v_sum", "v_min", "v_max"]
    g = (got.select(cols).toPandas()
         .sort_values(["event_type", "bucket"]).reset_index(drop=True))
    b = (batch.select(cols).toPandas()
         .sort_values(["event_type", "bucket"]).reset_index(drop=True))
    assert len(g) == len(b) and len(g) > 0
    pd.testing.assert_frame_equal(g, b, check_exact=False, rtol=1e-12)
    assert os.path.isdir(ckpt)
