"""Per-query measurement harness for the optimization rounds (bench.py is
frozen for the driver; extra instrumentation lives here — guide §1.4).

Times EVERY graded ``queries()`` entry with the noop sink (computes every
column of every row, no collect cost) and optionally dumps each query's
``explain("formatted")`` plan.

Usage:
  python bench_extra.py [--sf DIR] [--plans OUTDIR] [--reps N] [key ...]

Prints one JSON line: {"sf_dir": ..., "queries": {name: best_sec}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkts.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None,
                    help="directory to write <key>.txt explain dumps")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("sparkts-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    # prewarm python workers (same discipline as bench.py)
    spark.range(cpus * 4, numPartitions=cpus * 4).groupBy("id").applyInPandas(
        lambda pdf: pdf, "id long").count()

    qs = entry.queries()
    keys = args.keys or list(qs)
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
    timings: dict[str, float] = {}
    for k in keys:
        fn = qs[k]
        spark.sparkContext.setJobDescription(f"bench_extra: {k}")
        if args.plans:
            try:
                df = fn(spark, args.sf)
                with open(os.path.join(args.plans, f"{k}.txt"), "w") as fh:
                    fh.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")))
            except Exception as exc:  # plan dump must never kill the run
                print(f"# plan dump failed for {k}: {exc}", file=sys.stderr)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[k] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": args.sf, "cpus": cpus, "queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
