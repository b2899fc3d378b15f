"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship rollup→gap-fill→forecast pipeline on
sf0.001. ``queries()`` exposes one callable per implemented operator
(SURVEY.md §2), each with a DuckDB-equivalent ``oracle_sql()`` twin where the
semantics are SQL-expressible. Column names/aliases match exactly between the
Spark and SQL sides; float aggregates are rounded identically on both sides
(sums of 2-decimal inputs at 4dp — provably rounding-stable; ratios at 6dp).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from sparkts.engine import SparkForecast
from sparkts.kernels import (
    ADIDA,
    IMAPA,
    TSB,
    AutoTheta,
    CrostonClassic,
    CrostonSBA,
    HistoricAverage,
    Naive,
    RandomWalkWithDrift,
    SeasonalExponentialSmoothing,
    SeasonalNaive,
    SimpleExponentialSmoothing,
    SimpleExponentialSmoothingOptimized,
    WindowAverage,
)
from sparkts.kernels import (
    ARIMA,
    GARCH,
    MSTL,
    AutoCES,
    AutoETS,
    ConformalSeasonalPool,
    LocalLinearTrend,
)
from sparkts.kernels.base import norm_ppf
from sparkts.operators import (
    apply_retention,
    build_tiers,
    calendar_spine,
    gap_fill,
    rollup_base,
    rollup_cascade,
)
from sparkts.operators.compress import compress_tier, decompress_tier
from sparkts.operators.dedup import minhash_dedup_pairs, simhash_near_dup_pairs
from sparkts.operators.similarity import cosine_topk, lsh_ann_topk
from sparkts.operators.text import fingerprint, quality_score

# --------------------------------------------------------------------------- #
# helpers
# --------------------------------------------------------------------------- #

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _stats_r():
    """Rounded decomposable stats, shared by the rollup queries (lazy:
    Column construction needs an active session in PySpark 4)."""
    return [
        F.col("n_rows"),
        F.round("v_sum", 4).alias("v_sum"),
        F.round("v_min", 4).alias("v_min"),
        F.round("v_max", 4).alias("v_max"),
    ]


def _dense_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → 1h tier → dense calendar spine, missing hours = 0 activity.

    The panel every forecast query runs on: (unique_id=event_type, ds, y).
    """
    tier = rollup_base(_t(spark, sf_dir, "events"), "ts", ["event_type"], "value", "1h")
    filled = gap_fill(
        tier, ["event_type"], "bucket", value_cols=[], step_s=3600, zero_cols=["v_sum"]
    )
    return filled.select(
        F.col("event_type").alias("unique_id"),
        F.col("bucket").alias("ds"),
        F.col("v_sum").alias("y"),
    )


# The DuckDB twin of _dense_panel, reused by every forecast oracle.
_PANEL_CTE = """
agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, sum(value) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT event_type, min(bucket) lo, max(bucket) hi FROM agg GROUP BY 1),
spine AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
),
panel AS (
  SELECT s.event_type AS unique_id, s.bucket AS ds, coalesce(a.v, 0.0) AS y
  FROM spine s LEFT JOIN agg a
    ON a.event_type = s.event_type AND a.bucket = s.bucket
)
"""


# --------------------------------------------------------------------------- #
# time-series operator queries (events table)
# --------------------------------------------------------------------------- #

def q_rollup_1h(spark, sf_dir):
    """Base-tier windowed aggregate (SURVEY §2.4 `_chunk_sums` as a
    distributed time-bucket rollup)."""
    out = rollup_base(_t(spark, sf_dir, "events"), "ts", ["event_type"], "value", "1h")
    return out.select("event_type", "bucket", *_stats_r())


def q_rollup_5m_cascade(spark, sf_dir):
    """Continuous-aggregate cascade 1m→5m; oracle computes 5m directly —
    proves tier re-aggregation ≡ direct rollup."""
    base = rollup_base(_t(spark, sf_dir, "events"), "ts", ["event_type"], "value", "1m")
    out = rollup_cascade(base, ["event_type"], "5m")
    return out.select("event_type", "bucket", *_stats_r())


def q_rollup_1d_cascade(spark, sf_dir):
    """Full cascade 1m→5m→1h→1d vs direct daily rollup."""
    tiers = build_tiers(_t(spark, sf_dir, "events"), "ts", ["event_type"], "value")
    return tiers["1d"].select("event_type", "bucket", *_stats_r())


def q_retention_1h(spark, sf_dir):
    """Retention sweep: keep only the trailing 7 days of 1h buckets."""
    tier = rollup_base(_t(spark, sf_dir, "events"), "ts", ["event_type"], "value", "1h")
    kept = apply_retention(
        {"1h": tier}, horizons={"1h": 7 * 86400}, as_of="2024-01-31 00:00:00"
    )["1h"]
    return kept.select("event_type", "bucket", *_stats_r())


def q_gapfill_ffill(spark, sf_dir):
    """Calendar-spine densify + forward-fill (LOCF) on the 1h tier."""
    tier = rollup_base(_t(spark, sf_dir, "events"), "ts", ["event_type"], "value", "1h")
    filled = gap_fill(tier, ["event_type"], "bucket", ["v_sum"], 3600)
    return filled.select(
        "event_type",
        "bucket",
        F.round("v_sum", 4).alias("v_ffill"),
        F.col("is_gap"),
    )


def q_seasonal_lag_fitted(spark, sf_dir):
    """SeasonalNaive in-sample fitted = lag(season) over each series
    (reference utils.py:231-261 fitted path) on the dense 1h panel, m=24."""
    panel = _dense_panel(spark, sf_dir)
    w = W.partitionBy("unique_id").orderBy("ds")
    return panel.select(
        "unique_id",
        "ds",
        F.round("y", 4).alias("y"),
        F.round(F.lag("y", 24).over(w), 4).alias("snaive_fitted"),
    )


def q_naive_fc(spark, sf_dir):
    """Naive forecast h=24 through the engine (applyInPandas kernel)."""
    sf = SparkForecast([Naive()], freq="h")
    out = sf.forecast(_dense_panel(spark, sf_dir), h=24)
    return out.select("unique_id", "ds", F.round("Naive", 4).alias("naive_fc"))


def q_snaive_fc(spark, sf_dir):
    """SeasonalNaive(24) forecast h=24 (tile of the last day)."""
    sf = SparkForecast([SeasonalNaive(24)], freq="h")
    out = sf.forecast(_dense_panel(spark, sf_dir), h=24)
    return out.select("unique_id", "ds", F.round("SeasonalNaive", 4).alias("snaive_fc"))


def q_hist_avg_fc(spark, sf_dir):
    """HistoricAverage forecast h=1 (global mean per series)."""
    sf = SparkForecast([HistoricAverage()], freq="h")
    out = sf.forecast(_dense_panel(spark, sf_dir), h=1)
    return out.select("unique_id", "ds", F.round("HistoricAverage", 6).alias("havg_fc"))


def q_window_avg_fc(spark, sf_dir):
    """WindowAverage(168) forecast h=1 (trailing-week mean)."""
    sf = SparkForecast([WindowAverage(168)], freq="h")
    out = sf.forecast(_dense_panel(spark, sf_dir), h=1)
    return out.select("unique_id", "ds", F.round("WindowAverage", 6).alias("wavg_fc"))


def q_rwd_fc(spark, sf_dir):
    """RandomWalkWithDrift forecast h=12."""
    sf = SparkForecast([RandomWalkWithDrift()], freq="h")
    out = sf.forecast(_dense_panel(spark, sf_dir), h=12)
    return out.select("unique_id", "ds", F.round("RWD", 6).alias("rwd_fc"))


def q_ses_fc(spark, sf_dir):
    """SES(α=0.5) forecast h=1; oracle uses the closed-form weight sum
    l_{n-1} = c^{n-1}·y_0 + Σ α·c^{n-i}·y_{i-1} (1-based i>1)."""
    sf = SparkForecast([SimpleExponentialSmoothing(0.5)], freq="h")
    out = sf.forecast(_dense_panel(spark, sf_dir), h=1)
    return out.select("unique_id", "ds", F.round("SES", 6).alias("ses_fc"))


def q_cv_naive(spark, sf_dir):
    """Rolling-origin cross-validation (h=24, 2 windows, step 24) with Naive
    (reference core.py:246-383 window math)."""
    sf = SparkForecast([Naive()], freq="h")
    out = sf.cross_validation(_dense_panel(spark, sf_dir), h=24, n_windows=2, step_size=24)
    return out.select(
        "unique_id",
        "ds",
        "cutoff",
        F.round("y", 4).alias("y"),
        F.round("Naive", 4).alias("naive_cv"),
    )


# --------------------------------------------------------------------------- #
# relational coverage (TPC-H-ish tables)
# --------------------------------------------------------------------------- #

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped aggregate over lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "2001-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_revenue_by_priority(spark, sf_dir):
    """orders ⋈ lineitem shuffle join, revenue per priority."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


def q_customer_nation(spark, sf_dir):
    """customer ⋈ nation ⋈ region with broadcast dims (small sides hinted)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("sum_acctbal"),
        )
    )


# --------------------------------------------------------------------------- #
# text / dedup / similarity (documents + embeddings tables)
# --------------------------------------------------------------------------- #

def q_doc_stats(spark, sf_dir):
    """Per-language text-quality stats: token count via \\S+ runs, punct count."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    punct = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), r"[\.,;:!\?]", "")
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.sum(toks).alias("total_tokens"),
        F.sum(punct).alias("total_punct"),
    )


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: md5 content hash → group size + representative doc."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_doc_id"))
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Near-dup candidate pairs by word-bigram Jaccard ≥ 0.05 on a doc_id<200
    slice (the exact-similarity baseline the MinHash path approximates)."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))")
        ).alias("s"),
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.05)
    )
    return jac


def q_cosine_similarity(spark, sf_dir):
    """Brute-force cosine similarity of every embedding vs vec_id=0, the
    exact ANN baseline; JVM-side F.aggregate/zip_with dot products (no UDF)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    joined = e.crossJoin(F.broadcast(q))
    dot = F.aggregate(
        F.zip_with("embedding", "qe", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    cos = dot / (norm(F.col("embedding")) * norm(F.col("qe")))
    return (
        joined.select(F.col("vec_id"), F.round(cos, 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= 0.1)
    )


# --------------------------------------------------------------------------- #
# additional operator queries (round 1b)
# --------------------------------------------------------------------------- #

def q_naive_intervals(spark, sf_dir):
    """Naive forecast with 95% gaussian intervals — interval math
    (sigma·z·√step) verified against a closed-form SQL oracle."""
    sf = SparkForecast([Naive()], freq="h")
    out = sf.forecast(_dense_panel(spark, sf_dir), h=12, level=[95])
    return out.select(
        "unique_id",
        "ds",
        F.round("Naive", 4).alias("fc"),
        F.round(F.col("Naive-lo-95"), 4).alias("lo95"),
        F.round(F.col("Naive-hi-95"), 4).alias("hi95"),
    )


def q_gapfill_seasonal(spark, sf_dir):
    """Seasonal-naive gap interpolation (m=24): a missing bucket takes the
    last observed value at the same phase (reference utils.py:231-261)."""
    tier = rollup_base(_t(spark, sf_dir, "events"), "ts", ["event_type"], "value", "1h")
    filled = gap_fill(tier, ["event_type"], "bucket", ["v_sum"], 3600, season_length=24)
    return filled.select(
        "event_type", "bucket", F.round("v_sum", 4).alias("v_filled"), "is_gap"
    )


def q_compress_roundtrip(spark, sf_dir):
    """Gorilla-XOR + delta-of-delta codec inside the gate: decompress(compress
    (1h tier)) must equal the direct SQL rollup bit-for-bit."""
    tier = rollup_base(_t(spark, sf_dir, "events"), "ts", ["event_type"], "value", "1h")
    seg = compress_tier(tier, ["event_type"], "bucket", "v_sum")
    back = decompress_tier(seg, ["event_type"], "bucket", "v_sum")
    return back.select("event_type", "bucket", F.round("v_sum", 4).alias("v_sum"))


def q_cosine_topk(spark, sf_dir):
    """Exact ANN baseline: top-10 by cosine vs vec_id=0. Ranked on the
    *rounded* similarity (ties → lower id) so rank order is identical to the
    SQL oracle to the last ulp."""
    from pyspark.sql import Window as W2
    from sparkts.operators.similarity import cosine_similarity_col

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).first().embedding
    qcol = F.array(*[F.lit(float(x)) for x in q])
    scored = emb.select(
        "vec_id",
        F.round(cosine_similarity_col(F.col("embedding"), qcol), 6).alias("cos_sim"),
    )
    w = W2.orderBy(F.desc("cos_sim"), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 10)


def q_quality_stats(spark, sf_dir):
    """Text-quality features aggregated per source (same regexes in SQL)."""
    d = quality_score(_t(spark, sf_dir, "documents"))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("punct_ratio"), 6).alias("avg_punct"),
        F.round(F.avg("digit_ratio"), 6).alias("avg_digit"),
        F.round(F.avg("quality_score"), 6).alias("avg_quality"),
    )


def q_fingerprint_md5(spark, sf_dir):
    """Normalized-content fingerprints (case/whitespace-insensitive md5)."""
    d = fingerprint(_t(spark, sf_dir, "documents"))
    return d.select("doc_id", "fp_md5")


# --- rows-only checks (hash/optimizer semantics not SQL-expressible) -------- #

def q_minhash_pairs(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs (64 hashes, 16 bands)."""
    return minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.3
    ).select("doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard"))


def q_simhash_pairs(spark, sf_dir):
    """SimHash banded near-dup pairs (hamming ≤ 8)."""
    return simhash_near_dup_pairs(_t(spark, sf_dir, "documents"), max_hamming=8)


def q_lsh_ann(spark, sf_dir):
    """Approximate top-10 by hyperplane LSH + exact re-rank."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).first().embedding
    return lsh_ann_topk(emb, list(q), k=10, n_planes=4, n_tables=8).select(
        "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    )


def q_intermittent_fc(spark, sf_dir):
    """Croston/ADIDA/IMAPA/TSB on sparse per-user error counts (h=1)."""
    ev = _t(spark, sf_dir, "events")
    sparse = (
        ev.where(F.col("event_type") == "error")
        .groupBy((F.col("user_id") % 97).alias("unique_id"),
                 F.date_trunc("day", "ts").alias("ds"))
        .agg(F.count("*").cast("double").alias("y"))
    )
    spine = gap_fill(
        sparse.withColumnRenamed("ds", "bucket"), ["unique_id"], "bucket",
        value_cols=[], step_s=86400, zero_cols=["y"],
    ).select("unique_id", F.col("bucket").alias("ds"), "y")
    sf = SparkForecast(
        [CrostonClassic(), CrostonSBA(), ADIDA(), IMAPA(), TSB(0.2, 0.2)],
        freq="D",
    )
    out = sf.forecast(spine, h=1)
    return out.select(
        "unique_id",
        "ds",
        *[F.round(c, 6).alias(c.lower()) for c in
          ["CrostonClassic", "CrostonSBA", "ADIDA", "IMAPA", "TSB"]],
    )


def q_smoothing_fc(spark, sf_dir):
    """Optimized SES + per-phase seasonal ES (golden-section α) h=4."""
    sf = SparkForecast(
        [SimpleExponentialSmoothingOptimized(), SeasonalExponentialSmoothing(24, 0.3)],
        freq="h",
    )
    out = sf.forecast(_dense_panel(spark, sf_dir), h=4)
    return out.select(
        "unique_id", "ds",
        F.round("SESOpt", 6).alias("ses_opt"),
        F.round("SeasonalES", 6).alias("seasonal_es"),
    )


def q_theta_fc(spark, sf_dir):
    """AutoTheta (STM/OTM/DSTM/DOTM by MSE, ACF seasonality test, classical
    decomposition) on the daily tier, m=7, h=7."""
    tier = rollup_base(_t(spark, sf_dir, "events"), "ts", ["event_type"], "value", "1d")
    panel = tier.select(
        F.col("event_type").alias("unique_id"),
        F.col("bucket").alias("ds"),
        F.col("v_sum").alias("y"),
    )
    sf = SparkForecast([AutoTheta(season_length=7)], freq="D")
    out = sf.forecast(panel, h=7)
    return out.select("unique_id", "ds", F.round("AutoTheta", 4).alias("theta_fc"))


def q_cv_multimodel(spark, sf_dir):
    """Rolling-origin CV with three models at once (schema-wide kernel)."""
    sf = SparkForecast(
        [Naive(), SeasonalNaive(24), SimpleExponentialSmoothing(0.3)], freq="h"
    )
    out = sf.cross_validation(
        _dense_panel(spark, sf_dir), h=12, n_windows=2, step_size=12
    )
    return out.select(
        "unique_id", "ds", "cutoff",
        F.round("y", 4).alias("y"),
        F.round("Naive", 4).alias("naive"),
        F.round("SeasonalNaive", 4).alias("snaive"),
        F.round("SES", 6).alias("ses"),
    )


def _daily_panel(spark, sf_dir):
    tier = rollup_base(_t(spark, sf_dir, "events"), "ts", ["event_type"], "value", "1d")
    return tier.select(
        F.col("event_type").alias("unique_id"),
        F.col("bucket").alias("ds"),
        F.col("v_sum").alias("y"),
    )


def q_autoets_fc(spark, sf_dir):
    """AutoETS (state-space exponential smoothing, AICc selection over
    error/trend/season specs) on the daily tier, m=7. Non-SQL-expressible
    (iterative MLE) — rows-only driver check; parity covered by
    tests/test_models_heavy.py golden values."""
    sf = SparkForecast([AutoETS(season_length=7)], freq="D")
    out = sf.forecast(_daily_panel(spark, sf_dir), h=7)
    return out.select("unique_id", "ds", F.round("AutoETS", 4).alias("ets_fc"))


def q_mstl_fc(spark, sf_dir):
    """MSTL decomposition forecast (loess STL per period, ETS trend
    sub-forecaster, seasonal tiling) on the hourly tier, m=24."""
    sf = SparkForecast([MSTL(season_length=24)], freq="h")
    out = sf.forecast(_dense_panel(spark, sf_dir), h=24)
    return out.select("unique_id", "ds", F.round("MSTL", 4).alias("mstl_fc"))


def q_arima_fc(spark, sf_dir):
    """Fixed-order ARIMA(1,1,1) via CSS on the daily tier. Iterative
    optimization — rows-only driver check."""
    sf = SparkForecast([ARIMA(order=(1, 1, 1))], freq="D")
    out = sf.forecast(_daily_panel(spark, sf_dir), h=7)
    return out.select("unique_id", "ds", F.round("ARIMA", 4).alias("arima_fc"))


def q_ces_fc(spark, sf_dir):
    """AutoCES (complex exponential smoothing, N/S/P/F season selection by
    AICc) on the daily tier, m=7."""
    sf = SparkForecast([AutoCES(season_length=7)], freq="D")
    out = sf.forecast(_daily_panel(spark, sf_dir), h=7)
    return out.select("unique_id", "ds", F.round("CES", 4).alias("ces_fc"))


def q_simulate_paths(spark, sf_dir):
    """Sample-path simulation: n_paths seeded trajectories per series
    (reference core.py:1076-1093); seeds derive from (root_seed, id) so the
    output is identical under any partitioning."""
    sf = SparkForecast([SeasonalNaive(24)], freq="h")
    out = sf.simulate(_dense_panel(spark, sf_dir), h=6, n_paths=3, seed=7)
    return out.select(
        "unique_id", "ds", "sample_id",
        F.round("SeasonalNaive", 4).alias("sim_path"),
    )


def q_mfles_fc(spark, sf_dir):
    """MFLES gradient-boosted decomposition forecast on the daily tier."""
    from sparkts.kernels import MFLES

    sf = SparkForecast([MFLES(season_length=7)], freq="D")
    out = sf.forecast(_daily_panel(spark, sf_dir), h=7)
    return out.select("unique_id", "ds", F.round("MFLES", 4).alias("mfles_fc"))


def q_tbats_fc(spark, sf_dir):
    """AutoTBATS (trigonometric seasonal state space) on the daily tier."""
    from sparkts.kernels import AutoTBATS

    sf = SparkForecast([AutoTBATS(season_length=7)], freq="D")
    out = sf.forecast(_daily_panel(spark, sf_dir), h=7)
    return out.select("unique_id", "ds", F.round("AutoTBATS", 4).alias("tbats_fc"))


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: html as opaque binary payload → JVM-side
    metadata sniff + mapInPandas deterministic feature decode (the real
    decoder is stubbed per environment; plumbing is real)."""
    from sparkts.operators import attach_media_meta, decode_features

    pages = _t(spark, sf_dir, "documents").select(
        F.col("doc_id"), F.encode(F.col("text"), "UTF-8").alias("media")
    ).limit(2000)
    meta = attach_media_meta(pages)
    feats = decode_features(meta, fake=True, dim=8)
    return feats.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.round(F.aggregate("features", F.lit(0.0),
                            lambda a, x: a + x.cast("double")), 4).alias("feat_sum"),
    ).orderBy("doc_id")


def q_winnow_pairs(spark, sf_dir):
    """Winnowing (rolling-hash) near-dup candidates: docs sharing ≥ 5
    fingerprints (Schleimer-Wilkerson-Aiken; substring-locality guarantee
    the MinHash path lacks). Rows-only check (rolling hash not
    SQL-expressible); semantics covered by tests/test_text.py."""
    from sparkts.operators import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    # k=28 ≈ 4 words of the synthetic 6-char vocabulary — short grams would
    # collide on shared vocabulary rather than shared passages
    fp = winnow_fingerprints(docs, k=28, window=6)
    a, b = fp.alias("a"), fp.alias("b")
    pairs = (
        a.join(b, (F.col("a.fingerprint") == F.col("b.fingerprint"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= 3)
    )
    return pairs.orderBy("doc_a", "doc_b")


def q_ivf_ann(spark, sf_dir):
    """IVF approximate nearest neighbors: k-means coarse quantizer (seeded,
    driver-side sample), JVM-side list assignment, nprobe=4 probe + exact
    cosine re-rank. Rows-only check; recall-vs-bruteforce covered by
    tests/test_ivf.py."""
    from sparkts.operators import ivf_ann_topk, train_ivf_centroids

    emb = _t(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, n_lists=8, sample_rows=500, seed=7)
    q = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    out = ivf_ann_topk(emb, list(q), cents, k=10, nprobe=4)
    return out.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")


def q_ols_exog(spark, sf_dir):
    """Exogenous-regressor path end-to-end with a SQL oracle: per-series
    OLS of v_sum on n_rows over the 1h tier, predicted at three fixed
    future regressor values (10/20/30). Exercises the cogrouped
    applyInPandas exog zip; DuckDB checks via regr_intercept/regr_slope."""
    from sparkts.kernels import LinearRegression

    tier = rollup_base(_t(spark, sf_dir, "events"), "ts", ["event_type"], "value", "1h")
    panel = tier.select(
        F.col("event_type").alias("unique_id"),
        F.col("bucket").alias("ds"),
        F.col("v_sum").alias("y"),
        F.col("n_rows").cast("double").alias("x"),
    )
    # fresh read for the id list — deriving it from `panel` would make the
    # cogroup an ambiguous self-join
    ids = (_t(spark, sf_dir, "events")
           .select(F.col("event_type").alias("unique_id")).distinct())
    X_df = ids.crossJoin(
        spark.range(1, 4).select(
            F.col("id").cast("int").alias("step"),
            (F.col("id") * 10.0).alias("x"),
        )
    ).select("unique_id", F.col("step").alias("ds"), "x")
    sf = SparkForecast([LinearRegression()], freq=1)
    out = sf.forecast(panel.withColumn("ds", F.col("ds").cast("long")),
                      h=3, X_df=X_df.withColumn("ds", F.col("ds").cast("long")))
    return out.select(
        "unique_id",
        F.col("ds").cast("int").alias("step"),
        F.round("LinearRegression", 4).alias("ols_pred"),
    )


def q_csp_intervals(spark, sf_dir):
    """ConformalSeasonalPool: seasonal-naive mean + pooled-conformal sample
    quantile intervals, seeded (partition-independent)."""
    sf = SparkForecast([ConformalSeasonalPool(24, seed=5)], freq="h")
    out = sf.forecast(_dense_panel(spark, sf_dir), h=12, level=[90])
    return out.select(
        "unique_id", "ds",
        F.round("ConformalSeasonalPool", 4).alias("csp_mean"),
        F.round("ConformalSeasonalPool-lo-90", 4).alias("csp_lo90"),
        F.round("ConformalSeasonalPool-hi-90", 4).alias("csp_hi90"),
    )


def q_ucm_fc(spark, sf_dir):
    """Structural state-space LocalLinearTrend via Kalman MLE on the daily
    tier."""
    sf = SparkForecast([LocalLinearTrend()], freq="D")
    out = sf.forecast(_daily_panel(spark, sf_dir), h=7)
    return out.select("unique_id", "ds",
                      F.round("LocalLinearTrend", 4).alias("ucm_fc"))


def q_garch_fc(spark, sf_dir):
    """GARCH(1,1) volatility forecast on per-event-type hourly log-returns
    of v_sum (demeaned). Seeded simulated path per the reference's
    semantics — deterministic, partition-independent."""
    panel = _dense_panel(spark, sf_dir).withColumn(
        "y", F.col("y") - F.avg("y").over(W.partitionBy("unique_id"))
    )
    sf = SparkForecast([GARCH(1, 1)], freq="h")
    out = sf.forecast(panel, h=12)
    return out.select("unique_id", "ds", F.round("GARCH(1,1)", 4).alias("garch_fc"))


# --------------------------------------------------------------------------- #
# driver contract
# --------------------------------------------------------------------------- #

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events → 1m..1d tiers → gap-filled 1h panel →
    SeasonalNaive+Naive forecast with 90% intervals (sf0.001)."""
    sf_dir = "/root/testdata/sf0.001"
    panel = _dense_panel(spark, sf_dir)
    sf = SparkForecast([SeasonalNaive(24), Naive()], freq="h")
    return sf.forecast(panel, h=24, level=[90])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1h": q_rollup_1h,
        "rollup_5m_cascade": q_rollup_5m_cascade,
        "rollup_1d_cascade": q_rollup_1d_cascade,
        "retention_1h": q_retention_1h,
        "gapfill_ffill": q_gapfill_ffill,
        "seasonal_lag_fitted": q_seasonal_lag_fitted,
        "naive_fc": q_naive_fc,
        "snaive_fc": q_snaive_fc,
        "hist_avg_fc": q_hist_avg_fc,
        "window_avg_fc": q_window_avg_fc,
        "rwd_fc": q_rwd_fc,
        "ses_fc": q_ses_fc,
        "cv_naive": q_cv_naive,
        "pricing_summary": q_pricing_summary,
        "revenue_by_priority": q_revenue_by_priority,
        "customer_nation": q_customer_nation,
        "doc_stats": q_doc_stats,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "cosine_similarity": q_cosine_similarity,
        "naive_intervals": q_naive_intervals,
        "gapfill_seasonal": q_gapfill_seasonal,
        "compress_roundtrip": q_compress_roundtrip,
        "cosine_topk": q_cosine_topk,
        "quality_stats": q_quality_stats,
        "cv_multimodel": f"""
            WITH {_PANEL_CTE},
            idx AS (
              SELECT *, row_number() OVER (PARTITION BY unique_id ORDER BY ds) rn,
                     count(*) OVER (PARTITION BY unique_id) n
              FROM panel
            ),
            cuts AS (
              SELECT DISTINCT unique_id, n, n - 24 + w * 12 AS cut_rn
              FROM idx, unnest(generate_series(0, 1)) t(w)
            ),
            cutts AS (
              SELECT c.unique_id, c.cut_rn, i.ds AS cutoff, i.y AS naive_fc
              FROM cuts c JOIN idx i
                ON i.unique_id = c.unique_id AND i.rn = c.cut_rn
            ),
            ses AS (
              SELECT c.unique_id, c.cut_rn,
                     sum(CASE WHEN i.rn = 1 THEN power(0.7, c.cut_rn - 1) * i.y
                              ELSE 0.3 * power(0.7, c.cut_rn - i.rn) * i.y END
                     ) AS ses_fc
              FROM cuts c JOIN idx i
                ON i.unique_id = c.unique_id AND i.rn <= c.cut_rn
              GROUP BY 1, 2
            )
            SELECT i.unique_id, i.ds, ct.cutoff, round(i.y, 4) AS y,
                   round(ct.naive_fc, 4) AS naive,
                   round(sn.y, 4) AS snaive,
                   round(s.ses_fc, 6) AS ses
            FROM cutts ct
            JOIN idx i ON i.unique_id = ct.unique_id
                      AND i.rn > ct.cut_rn AND i.rn <= ct.cut_rn + 12
            JOIN idx sn ON sn.unique_id = ct.unique_id AND sn.rn = i.rn - 24
            JOIN ses s ON s.unique_id = ct.unique_id AND s.cut_rn = ct.cut_rn
        """,
        "ols_exog": """
            WITH tier AS (
              SELECT event_type, date_trunc('hour', ts) AS bucket,
                     round(sum(value), 4) AS v, count(value)::DOUBLE AS n
              FROM events GROUP BY 1, 2
            ), fits AS (
              SELECT event_type AS unique_id,
                     regr_intercept(v, n) AS b0, regr_slope(v, n) AS b1
              FROM tier GROUP BY 1
            )
            SELECT unique_id, step, round(b0 + b1 * (step * 10.0), 4) AS ols_pred
            FROM fits CROSS JOIN (SELECT unnest([1, 2, 3]) AS step)
        """,
        "fingerprint_md5": q_fingerprint_md5,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "lsh_ann": q_lsh_ann,
        "intermittent_fc": q_intermittent_fc,
        "smoothing_fc": q_smoothing_fc,
        "theta_fc": q_theta_fc,
        "cv_multimodel": q_cv_multimodel,
        "autoets_fc": q_autoets_fc,
        "mstl_fc": q_mstl_fc,
        "arima_fc": q_arima_fc,
        "garch_fc": q_garch_fc,
        "ces_fc": q_ces_fc,
        "simulate_paths": q_simulate_paths,
        "csp_intervals": q_csp_intervals,
        "ucm_fc": q_ucm_fc,
        "mfles_fc": q_mfles_fc,
        "tbats_fc": q_tbats_fc,
        "media_features": q_media_features,
        "ols_exog": q_ols_exog,
        "winnow_pairs": q_winnow_pairs,
        "ivf_ann": q_ivf_ann,
    }


def oracle_sql() -> dict[str, str]:
    stats = (
        "count(value) AS n_rows, round(sum(value), 4) AS v_sum, "
        "round(min(value), 4) AS v_min, round(max(value), 4) AS v_max"
    )
    return {
        "rollup_1h": f"""
            SELECT event_type, date_trunc('hour', ts) AS bucket, {stats}
            FROM events GROUP BY 1, 2
        """,
        "rollup_5m_cascade": f"""
            SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket, {stats}
            FROM events GROUP BY 1, 2
        """,
        "rollup_1d_cascade": f"""
            SELECT event_type, date_trunc('day', ts) AS bucket, {stats}
            FROM events GROUP BY 1, 2
        """,
        "retention_1h": f"""
            SELECT event_type, date_trunc('hour', ts) AS bucket, {stats}
            FROM events GROUP BY 1, 2
            HAVING bucket >= TIMESTAMP '2024-01-24 00:00:00'
        """,
        "gapfill_ffill": """
            WITH agg AS (
              SELECT event_type, date_trunc('hour', ts) AS bucket,
                     sum(value) AS v
              FROM events GROUP BY 1, 2
            ),
            bounds AS (SELECT event_type, min(bucket) lo, max(bucket) hi FROM agg GROUP BY 1),
            spine AS (
              SELECT b.event_type,
                     unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
              FROM bounds b
            )
            SELECT s.event_type, s.bucket,
                   round(last_value(a.v IGNORE NULLS) OVER (
                     PARTITION BY s.event_type ORDER BY s.bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_ffill,
                   a.v IS NULL AS is_gap
            FROM spine s LEFT JOIN agg a
              ON a.event_type = s.event_type AND a.bucket = s.bucket
        """,
        "seasonal_lag_fitted": f"""
            WITH {_PANEL_CTE}
            SELECT unique_id, ds, round(y, 4) AS y,
                   round(lag(y, 24) OVER (PARTITION BY unique_id ORDER BY ds), 4)
                     AS snaive_fitted
            FROM panel
        """,
        "naive_fc": f"""
            WITH {_PANEL_CTE},
            lastv AS (
              SELECT unique_id, max(ds) AS last_ds,
                     arg_max(y, ds) AS last_y
              FROM panel GROUP BY 1
            )
            SELECT unique_id,
                   last_ds + to_hours(s) AS ds,
                   round(last_y, 4) AS naive_fc
            FROM lastv, unnest(generate_series(1, 24)) t(s)
        """,
        "snaive_fc": f"""
            WITH {_PANEL_CTE},
            lastd AS (SELECT unique_id, max(ds) AS last_ds FROM panel GROUP BY 1),
            steps AS (
              SELECT l.unique_id, l.last_ds, s,
                     l.last_ds - to_hours(24 - 1 - ((s - 1) % 24)) AS src_ds
              FROM lastd l, unnest(generate_series(1, 24)) t(s)
            )
            SELECT st.unique_id, st.last_ds + to_hours(st.s) AS ds,
                   round(p.y, 4) AS snaive_fc
            FROM steps st JOIN panel p
              ON p.unique_id = st.unique_id AND p.ds = st.src_ds
        """,
        "hist_avg_fc": f"""
            WITH {_PANEL_CTE}
            SELECT unique_id, max(ds) + INTERVAL 1 HOUR AS ds,
                   round(avg(y), 6) AS havg_fc
            FROM panel GROUP BY unique_id
        """,
        "window_avg_fc": f"""
            WITH {_PANEL_CTE},
            idx AS (
              SELECT *, row_number() OVER (PARTITION BY unique_id ORDER BY ds DESC) rn
              FROM panel
            )
            SELECT unique_id, max(ds) + INTERVAL 1 HOUR AS ds,
                   round(avg(y), 6) AS wavg_fc
            FROM idx WHERE rn <= 168 GROUP BY unique_id
        """,
        "rwd_fc": f"""
            WITH {_PANEL_CTE},
            ends AS (
              SELECT unique_id, max(ds) AS last_ds, count(*) AS n,
                     arg_max(y, ds) AS y_last, arg_min(y, ds) AS y_first
              FROM panel GROUP BY 1
            )
            SELECT unique_id, last_ds + to_hours(s) AS ds,
                   round(y_last + (y_last - y_first) / (n - 1) * s, 6) AS rwd_fc
            FROM ends, unnest(generate_series(1, 12)) t(s)
        """,
        "ses_fc": f"""
            WITH {_PANEL_CTE},
            idx AS (
              SELECT *, row_number() OVER (PARTITION BY unique_id ORDER BY ds) rn,
                     count(*) OVER (PARTITION BY unique_id) n,
                     max(ds) OVER (PARTITION BY unique_id) last_ds
              FROM panel
            )
            SELECT unique_id, last_ds + INTERVAL 1 HOUR AS ds,
                   round(sum(CASE WHEN rn = 1 THEN power(0.5, n - 1) * y
                                  ELSE 0.5 * power(0.5, n - rn) * y END), 6) AS ses_fc
            FROM idx GROUP BY unique_id, last_ds
        """,
        "cv_naive": f"""
            WITH {_PANEL_CTE},
            idx AS (
              SELECT *, row_number() OVER (PARTITION BY unique_id ORDER BY ds) rn,
                     count(*) OVER (PARTITION BY unique_id) n
              FROM panel
            ),
            cuts AS (
              SELECT DISTINCT unique_id, n, n - 48 + w * 24 AS cut_rn
              FROM idx, unnest(generate_series(0, 1)) t(w)
            ),
            cutts AS (
              SELECT c.unique_id, c.cut_rn, i.ds AS cutoff, i.y AS fc
              FROM cuts c JOIN idx i ON i.unique_id = c.unique_id AND i.rn = c.cut_rn
            )
            SELECT i.unique_id, i.ds, c.cutoff, round(i.y, 4) AS y,
                   round(c.fc, 4) AS naive_cv
            FROM cutts c JOIN idx i
              ON i.unique_id = c.unique_id
             AND i.rn > c.cut_rn AND i.rn <= c.cut_rn + 24
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
            GROUP BY 1, 2
        """,
        "revenue_by_priority": """
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                   count(DISTINCT o_orderkey) AS n_orders
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1
        """,
        "customer_nation": """
            SELECT r_name, n_name, count(*) AS n_customers,
                   round(sum(c_acctbal), 4) AS sum_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2
        """,
        "doc_stats": r"""
            SELECT lang, count(*) AS n_docs,
                   round(avg(n_chars), 6) AS avg_chars,
                   sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS total_tokens,
                   sum(length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')))::BIGINT
                     AS total_punct
            FROM documents GROUP BY 1
        """,
        "dedup_exact": """
            SELECT md5(text) AS content_hash, count(*) AS n_dups,
                   min(doc_id) AS keep_doc_id
            FROM documents GROUP BY 1
        """,
        "ngram_jaccard_pairs": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE doc_id < 200
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(range(1, len(w)),
                            i -> w[i] || ' ' || w[i + 1])) AS s
              FROM toks
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(i / (sa.n + sb.n - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(i / (sa.n + sb.n - i), 6) >= 0.05
        """,
        "naive_intervals": f"""
            WITH {_PANEL_CTE},
            d AS (
              SELECT unique_id, y - lag(y) OVER (PARTITION BY unique_id ORDER BY ds) AS dd
              FROM panel
            ),
            sig AS (
              SELECT unique_id, sqrt(sum(dd*dd) / (count(*))) AS sigma
              FROM d WHERE dd IS NOT NULL GROUP BY 1
            ),
            lastv AS (
              SELECT unique_id, max(ds) AS last_ds, arg_max(y, ds) AS fc
              FROM panel GROUP BY 1
            )
            SELECT l.unique_id, l.last_ds + to_hours(s) AS ds,
                   round(l.fc, 4) AS fc,
                   round(l.fc - {norm_ppf(0.975)!r} * g.sigma * sqrt(s), 4) AS lo95,
                   round(l.fc + {norm_ppf(0.975)!r} * g.sigma * sqrt(s), 4) AS hi95
            FROM lastv l JOIN sig g USING (unique_id),
                 unnest(generate_series(1, 12)) t(s)
        """,
        "gapfill_seasonal": """
            WITH agg AS (
              SELECT event_type, date_trunc('hour', ts) AS bucket, sum(value) AS v
              FROM events GROUP BY 1, 2
            ),
            bounds AS (SELECT event_type, min(bucket) lo, max(bucket) hi FROM agg GROUP BY 1),
            spine AS (
              SELECT b.event_type,
                     unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
              FROM bounds b
            ),
            j AS (
              SELECT s.event_type, s.bucket, a.v,
                     (epoch(s.bucket)::BIGINT // 3600) % 24 AS phase
              FROM spine s LEFT JOIN agg a
                ON a.event_type = s.event_type AND a.bucket = s.bucket
            )
            SELECT event_type, bucket,
                   round(coalesce(
                     v,
                     last_value(v IGNORE NULLS) OVER (
                       PARTITION BY event_type, phase ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     last_value(v IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   ), 4) AS v_filled,
                   v IS NULL AS is_gap
            FROM j
        """,
        "compress_roundtrip": """
            SELECT event_type, date_trunc('hour', ts) AS bucket,
                   round(sum(value), 4) AS v_sum
            FROM events GROUP BY 1, 2
        """,
        "cosine_topk": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
            pairs AS (
              SELECT v.vec_id,
                     unnest(v.embedding)::DOUBLE AS x,
                     unnest(q.qe)::DOUBLE AS qx
              FROM embeddings v, q
            ),
            dots AS (
              SELECT vec_id, sum(x * qx) AS dot,
                     sqrt(sum(x * x)) AS nx, sqrt(sum(qx * qx)) AS nq
              FROM pairs GROUP BY 1
            ),
            scored AS (
              SELECT vec_id, round(dot / (nx * nq), 6) AS cos_sim FROM dots
            )
            SELECT vec_id, cos_sim, rank FROM (
              SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rank
              FROM scored
            ) WHERE rank <= 10
        """,
        "quality_stats": r"""
            WITH f AS (
              SELECT source,
                     length(text) AS n_chars,
                     len(string_split_regex(lower(text), '\s+')) AS n_tok,
                     round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE
                           / greatest(length(text), 1), 6) AS punct_ratio,
                     round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                           / greatest(length(text), 1), 6) AS digit_ratio
              FROM documents
            ),
            g AS (
              SELECT *,
                     round((n_chars - (n_tok - 1))::DOUBLE / greatest(n_tok, 1), 4)
                       AS mean_word_len
              FROM f
            ),
            s AS (
              SELECT source, punct_ratio, digit_ratio,
                     round(least(greatest(
                       0.5
                       + CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10 THEN 0.2 ELSE -0.2 END
                       + CASE WHEN punct_ratio <= 0.2 THEN 0.1 ELSE -0.2 END
                       + CASE WHEN digit_ratio <= 0.2 THEN 0.1 ELSE -0.2 END
                       + CASE WHEN n_chars >= 50 AND n_chars <= 50000 THEN 0.1 ELSE -0.2 END
                     , 0.0), 1.0), 4) AS quality_score
              FROM g
            )
            SELECT source, count(*) AS n_docs,
                   round(avg(punct_ratio), 6) AS avg_punct,
                   round(avg(digit_ratio), 6) AS avg_digit,
                   round(avg(quality_score), 6) AS avg_quality
            FROM s GROUP BY 1
        """,
        "cv_multimodel": f"""
            WITH {_PANEL_CTE},
            idx AS (
              SELECT *, row_number() OVER (PARTITION BY unique_id ORDER BY ds) rn,
                     count(*) OVER (PARTITION BY unique_id) n
              FROM panel
            ),
            cuts AS (
              SELECT DISTINCT unique_id, n, n - 24 + w * 12 AS cut_rn
              FROM idx, unnest(generate_series(0, 1)) t(w)
            ),
            cutts AS (
              SELECT c.unique_id, c.cut_rn, i.ds AS cutoff, i.y AS naive_fc
              FROM cuts c JOIN idx i
                ON i.unique_id = c.unique_id AND i.rn = c.cut_rn
            ),
            ses AS (
              SELECT c.unique_id, c.cut_rn,
                     sum(CASE WHEN i.rn = 1 THEN power(0.7, c.cut_rn - 1) * i.y
                              ELSE 0.3 * power(0.7, c.cut_rn - i.rn) * i.y END
                     ) AS ses_fc
              FROM cuts c JOIN idx i
                ON i.unique_id = c.unique_id AND i.rn <= c.cut_rn
              GROUP BY 1, 2
            )
            SELECT i.unique_id, i.ds, ct.cutoff, round(i.y, 4) AS y,
                   round(ct.naive_fc, 4) AS naive,
                   round(sn.y, 4) AS snaive,
                   round(s.ses_fc, 6) AS ses
            FROM cutts ct
            JOIN idx i ON i.unique_id = ct.unique_id
                      AND i.rn > ct.cut_rn AND i.rn <= ct.cut_rn + 12
            JOIN idx sn ON sn.unique_id = ct.unique_id AND sn.rn = i.rn - 24
            JOIN ses s ON s.unique_id = ct.unique_id AND s.cut_rn = ct.cut_rn
        """,
        "ols_exog": """
            WITH tier AS (
              SELECT event_type, date_trunc('hour', ts) AS bucket,
                     round(sum(value), 4) AS v, count(value)::DOUBLE AS n
              FROM events GROUP BY 1, 2
            ), fits AS (
              SELECT event_type AS unique_id,
                     regr_intercept(v, n) AS b0, regr_slope(v, n) AS b1
              FROM tier GROUP BY 1
            )
            SELECT unique_id, step, round(b0 + b1 * (step * 10.0), 4) AS ols_pred
            FROM fits CROSS JOIN (SELECT unnest([1, 2, 3]) AS step)
        """,
        "fingerprint_md5": r"""
            SELECT doc_id,
                   md5(array_to_string(string_split_regex(lower(trim(text)), '\s+'), ' '))
                     AS fp_md5
            FROM documents
        """,
        "cosine_similarity": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
            pairs AS (
              SELECT v.vec_id,
                     unnest(v.embedding)::DOUBLE AS x,
                     unnest(q.qe)::DOUBLE AS qx
              FROM embeddings v, q
            ),
            dots AS (
              SELECT vec_id, sum(x * qx) AS dot,
                     sqrt(sum(x * x)) AS nx, sqrt(sum(qx * qx)) AS nq
              FROM pairs GROUP BY 1
            )
            SELECT vec_id, round(dot / (nx * nq), 6) AS cos_sim
            FROM dots WHERE round(dot / (nx * nq), 6) >= 0.1
        """,
    }
