"""The north-rule deployment clause, exercised for real: the whole job
ships via ``spark-submit --py-files sparkts.zip`` — a REAL spark-submit
process, a zip built from the package sources, and a driver cwd OUTSIDE
the repo so nothing resolves from the working tree. What this sandbox
cannot spawn is a multi-executor cluster; the *shipping mechanism* (zip on
the driver and executor import path, no repo on sys.path) is exactly what
a 1000-executor run uses and is fully testable at local master."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = """
import json
from pyspark.sql import SparkSession, functions as F
from sparkts.operators import build_tiers, gap_fill
from sparkts.engine import SparkForecast
from sparkts.kernels import SeasonalNaive

spark = SparkSession.builder.getOrCreate()
spark.conf.set("spark.sql.session.timeZone", "UTC")
ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
tiers = build_tiers(ev, "ts", ["event_type"], "value")
filled = gap_fill(tiers["1h"], ["event_type"], "bucket", ["v_sum"], 3600,
                  season_length=24)
panel = filled.select(F.col("event_type").alias("unique_id"),
                      F.col("bucket").alias("ds"),
                      F.col("v_sum").alias("y"))
out = SparkForecast([SeasonalNaive(24)], freq="h").forecast(panel, h=6)
n_ids = panel.select("unique_id").distinct().count()
print(json.dumps({"tier_rows": tiers["1h"].count(),
                  "n_ids": n_ids,
                  "forecast_rows": out.count()}))
"""


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit")
@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.001/events.parquet"),
    reason="driver testdata absent")
def test_package_ships_via_spark_submit_py_files(tmp_path):
    zpath = tmp_path / "sparkts.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for root, dirs, files in os.walk(os.path.join(REPO, "sparkts")):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    job = tmp_path / "job.py"
    job.write_text(_JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [_spark_submit(), "--master", "local[4]",
         "--py-files", str(zpath), str(job)],
        capture_output=True, text=True, timeout=420,
        cwd=tmp_path, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["tier_rows"] > 0
    assert res["forecast_rows"] == res["n_ids"] * 6
