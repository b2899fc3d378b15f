"""Local replica of the driver's correctness gate: run queries()[k] on Spark
and oracle_sql()[k] on DuckDB over the same sf tables, compare row count,
column names, and (column-name-sorted, row-sorted) values.

Usage: python tools/oracle_check.py [sf_dir] [key ...]   (default: all keys
with an oracle at /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rows: spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"schema: spark={sc} oracle={oc}")
        return problems
    if problems:
        return problems
    a = spark_df[sc].copy()
    b = oracle_df[sc].copy()
    for df in (a, b):
        for c in sc:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = (pd.to_datetime(df[c]).astype("datetime64[us]")
                         .astype("int64"))
            elif df[c].dtype == object:
                df[c] = df[c].astype(str)
    a = a.sort_values(sc).reset_index(drop=True)
    b = b.sort_values(sc).reset_index(drop=True)
    for c in sc:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.number) and np.issubdtype(bv.dtype, np.number):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            bad = ~(np.isclose(av, bv, rtol=0, atol=1e-9)
                    | (np.isnan(av) & np.isnan(bv)))
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                problems.append(
                    f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r}")
        else:
            bad = av.astype(str) != bv.astype(str)
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                problems.append(
                    f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # Data-derived oracle literals (IVF centroids, LSH plane dims) must come
    # from the SAME tables the Spark query reads, or scale-dependent queries
    # spuriously mismatch at non-default sf (round-2 ivf_ann@sf0.001 lesson).
    os.environ.setdefault("SPARKTS_ORACLE_SF_DIR", sf_dir)
    import __spark_entry__ as e
    from sparkts.session import get_spark

    qs, os_ = e.queries(), e.oracle_sql()
    keys = sys.argv[2:] or [k for k in qs if k in os_]
    spark = get_spark("oracle-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_ok = 0
    for k in keys:
        if k not in os_:
            print(f"{k}: NO ORACLE (rows-only)")
            continue
        try:
            sdf = qs[k](spark, sf_dir).toPandas()
            odf = con.sql(os_[k]).df()
            probs = compare(sdf, odf)
        except Exception as ex:
            print(f"{k}: ERROR {type(ex).__name__}: {ex}")
            continue
        if probs:
            print(f"{k}: MISMATCH")
            for p in probs:
                print(f"    {p}")
        else:
            n_ok += 1
            print(f"{k}: OK ({len(sdf)} rows)")
    print(f"\n{n_ok}/{len(keys)} green")


if __name__ == "__main__":
    main()
