"""One measured pipeline run at a fixed parallelism level.

The north-star job: Common-Crawl-style pages → extraction check →
per-domain crawl-activity series → 1m/5m/1h/1d continuous-aggregate tiers →
retention sweep → gap-filled 1h panel → seasonal-naive forecast.

Scale design (what a 1000-executor run needs, applied here):
* ONE raw scan: the extraction-invariant check rides the 1m rollup as a
  sum-decomposable ``n_bad`` aggregate (crawl_activity_checked) instead of
  re-reading html+text.
* ONE action materializes the whole tier cascade + retention counts (a
  union over the persisted tiers); the cascade shuffles are tiny, so they
  run at 8 shuffle partitions (task-launch latency on this sandbox is
  ~13 ms — 64-partition stages of kB-sized data are pure overhead).
* The forecast stage restores cores*2 partitions: its cost is Python
  kernel work, which wants one Arrow batch per core.

Env: SPARKTS_BENCH_CPUS (cores), SPARKTS_BENCH_DATA (pages parquet path),
SPARKTS_BENCH_REPS (default 3; best rep reported — the sandbox VM is
multi-tenant and fluctuates 2-4x). Prints one JSON line. Run via subprocess
from scaling.py so each parallelism level gets a fresh JVM — mirrors
`spark-submit --py-files` runs at two cluster sizes (N vs 4N executors).
The sandbox can't spawn a multi-executor cluster, but the SHIPPING
mechanism itself (zip on the driver/executor import path, repo off
sys.path) is exercised for real by tests/test_submit.py with an actual
spark-submit process.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkts.engine import SparkForecast  # noqa: E402
from sparkts.kernels import Naive, SeasonalNaive  # noqa: E402
from sparkts.operators import (  # noqa: E402
    apply_retention,
    build_tiers,
    crawl_activity_checked,
    gap_fill,
)
from sparkts.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARKTS_BENCH_CPUS", "32"))
DATA = os.environ.get("SPARKTS_BENCH_DATA", "/tmp/sparkts_bench/pages.parquet")


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    # split sizing: ~3 scan tasks per core so the scan parallelizes at any
    # level (a fixed 128 MB default gives only ~11 splits on a small corpus)
    mpb = max(_dir_bytes(DATA) // (CPUS * 3), 8 * 1024 * 1024)
    spark = get_spark(
        f"sparkts-scaling-{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 2,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(mpb)},
    )
    pages = spark.read.parquet(DATA)
    n_input = pages.count()  # warm FS cache/metadata; excluded from timing

    # Prewarm the Python UDF workers (one per core: spawn + numpy/pandas
    # import ≈ 1-2 s each). On a real cluster these are long-lived executor
    # processes reused across jobs; paying the spawn inside the timed window
    # would charge the 4N run ~4x the warmup of the N run for identical work.
    import pandas as pd  # noqa: F401

    spark.range(CPUS * 4, numPartitions=CPUS * 4).groupBy("id").applyInPandas(
        lambda pdf: pdf, "id long"
    ).count()

    from sparkts.datagen import extract_text

    def run_pipeline():
        t0 = time.perf_counter()

        # stage 1+2 fused: ONE raw scan → per-row extraction-mismatch flag
        # + activity series → 1m base tier (n_bad rides the rollup).
        checked = extract_text(pages)
        act = crawl_activity_checked(
            checked, F.col("extracted_text") != F.col("text")
        )
        tiers = build_tiers(
            act, "warc_ts", ["domain"], "bytes",
            extra_aggs={"n_bad": F.sum("bad")},
        )
        base = tiers["1m"].persist()
        base.count()  # action 1: the big scan+shuffle

        # cascade + retention: tiny shuffles → small static partitioning;
        # one action materializes every tier and all counts.
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        for t, df in tiers.items():
            if t != "1m":
                df.persist()
        kept = apply_retention(tiers, as_of="2026-01-15 00:00:00")
        counted = None
        for t, df in kept.items():
            part = df.select(F.lit(t).alias("tier"))
            counted = part if counted is None else counted.unionByName(part)
        tier_points = {
            r["tier"]: r["n"]
            for r in counted.groupBy("tier").agg(F.count("*").alias("n")).collect()
        }
        # extraction invariant from the cached base tier (pre-retention)
        n_bad = base.agg(F.sum("n_bad")).collect()[0][0]

        # stage 3: gap-filled 1h panel → per-domain forecast (Python kernel
        # work → one Arrow batch per core)
        spark.conf.set("spark.sql.shuffle.partitions", str(CPUS * 2))
        filled = gap_fill(
            tiers["1h"], ["domain"], "bucket", value_cols=[], step_s=3600,
            zero_cols=["v_sum"],
        )
        panel = filled.select(
            F.col("domain").alias("unique_id"),
            F.col("bucket").alias("ds"),
            F.col("v_sum").alias("y"),
        )
        eng = SparkForecast([SeasonalNaive(24), Naive()], freq="h")
        n_fc = eng.forecast(panel, h=24).count()

        wall = time.perf_counter() - t0
        for df in tiers.values():
            df.unpersist()
        return wall, int(n_bad), tier_points, n_fc

    reps = int(os.environ.get("SPARKTS_BENCH_REPS", "3"))
    best = None
    for _ in range(reps):
        wall, n_bad, tier_points, n_fc = run_pipeline()
        if best is None or wall < best[0]:
            best = (wall, n_bad, tier_points, n_fc)
    wall, n_bad, tier_points, n_fc = best

    total_points = sum(tier_points.values())
    print(
        json.dumps(
            {
                "cpus": CPUS,
                "seconds": round(wall, 3),
                "input_rows": n_input,
                "extraction_mismatches": n_bad,
                "tier_points": tier_points,
                "rolled_up_points": total_points,
                "points_per_sec": round(total_points / wall, 1),
                "input_rows_per_sec": round(n_input / wall, 1),
                "forecast_rows": n_fc,
            }
        )
    )


if __name__ == "__main__":
    main()
