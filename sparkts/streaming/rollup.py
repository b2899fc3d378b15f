"""Structured Streaming path for the base rollup tier.

The reference has no streaming surface (SURVEY.md §2.9) — this is the
north-rule extension that makes the 1m base tier a *continuous* aggregate:
``readStream`` → event-time window + watermark → decomposable stats →
``foreachBatch`` merge into the same parquet/Iceberg tier layout the batch
cascade reads. Because every tier statistic is sum/min/max-decomposable
(operators/rollup.py), a streaming 1m tier upgrades the whole cascade to
incremental with no semantic change: 5m/1h/1d re-aggregate whatever 1m rows
exist, batch- or stream-produced.

Late data: the watermark bounds state; rows later than the watermark are
dropped by Spark (documented behavior). The batch backfill path
(rollup_base over the raw table) remains the source of truth for replays —
the lineage table records which bucket ranges came from which path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparkts.operators.rollup import TIERS


def stream_rollup(
    stream_df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    tier: str = "1m",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming base tier: event-time tumbling window of ``tier`` width
    with a late-data watermark; emits the same schema as rollup_base
    (keys, bucket, n_rows/v_sum/v_min/v_max/v_sumsq)."""
    width = TIERS[tier]
    v = F.col(value_col).cast("double")
    ts = F.col(ts_col).cast("timestamp")
    return (
        stream_df.withColumn("__ts", ts)
        .withWatermark("__ts", watermark)
        .groupBy(*key_cols, F.window("__ts", f"{width} seconds").alias("w"))
        .agg(
            F.count(v).alias("n_rows"),
            F.sum(v).alias("v_sum"),
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
            F.sum(v * v).alias("v_sumsq"),
        )
        .select(*key_cols, F.col("w.start").alias("bucket"),
                "n_rows", "v_sum", "v_min", "v_max", "v_sumsq")
    )


def write_tier_stream(
    tier_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Sink the streaming tier via ``foreachBatch`` in UPDATE mode with
    merge-on-read: each micro-batch appends its (possibly partial) bucket
    aggregates stamped with ``__batch_id``; readers take the latest stamp
    per (keys, bucket) — see ``read_tier_stream_output``. Update mode (not
    append) so the final, not-yet-watermark-closed buckets are still
    emitted; on Iceberg this sink becomes a MERGE INTO and the stamp column
    disappears. Resume safety comes from the streaming checkpoint.
    ``available_now`` processes the backlog and stops — the batch-like mode
    used in tests and backfills."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("__batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_path)

    writer = (
        tier_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_tier_stream_output(spark, out_path: str, key_cols: list[str]) -> DataFrame:
    """Merge-on-read over the update-mode sink: latest ``__batch_id`` wins
    per (keys, bucket)."""
    from pyspark.sql import Window as W

    df = spark.read.parquet(out_path)
    w = W.partitionBy(*key_cols, "bucket").orderBy(F.col("__batch_id").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__batch_id")
    )


def stream_cascade(spark, out_path: str, key_cols: list[str],
                   tiers: tuple[str, ...] = ("5m", "1h", "1d")) -> dict:
    """Upgrade the streaming 1m sink to the FULL tier cascade: merge-on-read
    the streamed 1m tier, then chain the batch cascade operator coarser tier
    by coarser tier (5m from 1m, 1h from 5m, …) exactly like
    ``build_tiers``. Because every tier statistic is decomposable, the
    result is identical to a batch cascade over the same raw rows — the
    streaming-equals-batch invariance extends to every tier, and a restart
    of the 1m stream (checkpointed) transparently refreshes all of them."""
    from sparkts.operators.rollup import rollup_cascade

    base = read_tier_stream_output(spark, out_path, key_cols)
    out = {"1m": base}
    prev = base
    for t in tiers:
        prev = rollup_cascade(prev, key_cols, t)
        out[t] = prev
    return out
