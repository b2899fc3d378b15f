"""Synthesize an sf1-scale probe dataset from the read-only sf0.1 tables.

The driver's generator (seed=42) is not available, and /root/testdata is
read-only — but a SCALE probe doesn't need the driver's exact rows, only a
self-consistent dataset ~10× larger: `tools/oracle_check.py` compares the
Spark queries against the DuckDB oracles on whatever directory it is
pointed at. Each fact table is replicated 10× with consistent key offsets
(foreign keys shift together, so joins behave), timestamps staggered a few
seconds per copy (so buckets/windows get denser, not just taller), and
embeddings deterministically perturbed (so similarity top-k has no exact
cross-copy ties). Dimension tables (region/nation) keep their size, like
TPC-H.

Usage: python tools/make_sf1.py [out_dir]   (default /root/repo/.scratch/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
K = 10  # replication factor
OFF = 10_000_000  # key offset per copy


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"SET threads TO {max(os.cpu_count() // 4, 2)}")

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t, sql):
        con.sql(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
                    ).fetchone()[0]
        print(f"{t}: {n} rows")

    # dimensions: unchanged
    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src(t)}")

    copies = f"(SELECT unnest(range({K})) AS k)"

    write("customer", f"""
        SELECT c_custkey + k*{OFF} AS c_custkey,
               c_name || '#' || k AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')} CROSS JOIN {copies}""")
    write("supplier", f"""
        SELECT s_suppkey + k*{OFF} AS s_suppkey,
               s_name || '#' || k AS s_name, s_nationkey, s_acctbal
        FROM {src('supplier')} CROSS JOIN {copies}""")
    write("part", f"""
        SELECT p_partkey + k*{OFF} AS p_partkey,
               p_name || '#' || k AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM {src('part')} CROSS JOIN {copies}""")
    write("orders", f"""
        SELECT o_orderkey + k*{OFF} AS o_orderkey,
               o_custkey + k*{OFF} AS o_custkey,
               o_orderstatus, o_totalprice,
               o_orderdate + to_seconds(k) AS o_orderdate, o_orderpriority
        FROM {src('orders')} CROSS JOIN {copies}""")
    write("lineitem", f"""
        SELECT l_orderkey + k*{OFF} AS l_orderkey,
               l_partkey + k*{OFF} AS l_partkey,
               l_suppkey + k*{OFF} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus,
               l_shipdate + to_seconds(k) AS l_shipdate
        FROM {src('lineitem')} CROSS JOIN {copies}""")
    write("events", f"""
        SELECT event_id + k*{OFF} AS event_id,
               ts + to_seconds(7*k) AS ts,
               user_id + k*{OFF} AS user_id,
               event_type, value, props
        FROM {src('events')} CROSS JOIN {copies}""")
    # perturb the text per copy (k>0): a verbatim ×10 replication puts
    # every document in a 10-clique of exact duplicates, which is not a
    # larger version of the corpus — it quadratically inflates candidate
    # pairs and makes the dedup-cluster transitive-closure oracle (a
    # recursive CTE) combinatorial. A per-copy prefix breaks cross-copy
    # shingles while copy 0 keeps the original corpus intact; n_chars
    # stays = length(text) (the source invariant).
    write("documents", f"""
        SELECT doc_id + k*{OFF} AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE 'variant ' || k || ' rev: ' || text END AS text,
               lang, source,
               CASE WHEN k = 0 THEN n_chars
                    ELSE n_chars + length('variant ' || k || ' rev: ')
               END AS n_chars
        FROM {src('documents')} CROSS JOIN {copies}""")
    # deterministic per-copy perturbation (not a pure rescale — cosine is
    # scale-invariant) so cross-copy vectors are near- but not exact
    # duplicates
    write("embeddings", f"""
        SELECT vec_id + k*{OFF} AS vec_id,
               list_transform(embedding,
                 (x, i) -> CAST(x + 0.0003*k*(((vec_id + i) % 5) - 2)
                           AS FLOAT)) AS embedding,
               label
        FROM {src('embeddings')} CROSS JOIN {copies}""")


if __name__ == "__main__":
    main()
