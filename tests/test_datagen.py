"""Datagen: determinism, url-purity invariant, extraction round-trip, skew."""

import pytest
from pyspark.sql import functions as F

from sparkts.datagen import extract_text, intermittent_series, panel_series, web_pages


@pytest.fixture(scope="module")
def pages(spark):
    return web_pages(spark, 5000, n_domains=50, seed=42).cache()


def test_schema(pages):
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    types = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert types["html"] == "binary"
    assert types["warc_ts"].startswith("timestamp")


def test_deterministic_under_partitioning(spark):
    a = web_pages(spark, 2000, seed=7, partitions=1).orderBy("url").toPandas()
    b = web_pages(spark, 2000, seed=7, partitions=16).orderBy("url").toPandas()
    assert a["url"].tolist() == b["url"].tolist()
    assert a["text"].tolist() == b["text"].tolist()
    assert a["warc_ts"].tolist() == b["warc_ts"].tolist()


def test_extraction_byte_identical(pages):
    """The north-star invariant: extracting from html reproduces text exactly."""
    bad = extract_text(pages).where(F.col("extracted_text") != F.col("text")).count()
    assert bad == 0


def test_text_properties(pages):
    stats = pages.select(
        F.min(F.length("text")).alias("mn"), F.max(F.length("text")).alias("mx")
    ).collect()[0]
    assert stats.mn >= 50
    assert stats.mx <= 2100


def test_domain_skew(pages):
    """Zipf head: the top domain must carry far more than the mean share."""
    counts = (
        pages.groupBy(F.parse_url("url", F.lit("HOST")).alias("d"))
        .count()
        .orderBy(F.desc("count"))
        .toPandas()
    )
    assert counts["count"].iloc[0] > 3 * counts["count"].mean()


def test_gaps_exist(pages):
    """Whole (domain, hour) cells are carved out → hour buckets per domain
    must be strictly fewer than the covered span for head domains."""
    hours = (
        pages.select(
            F.parse_url("url", F.lit("HOST")).alias("d"),
            F.date_trunc("hour", "warc_ts").alias("hb"),
        )
        .groupBy("d")
        .agg(
            F.countDistinct("hb").alias("n"),
            (
                (F.max("hb").cast("long") - F.min("hb").cast("long")) / 3600 + 1
            ).alias("span"),
        )
        .orderBy(F.desc("n"))
        .first()
    )
    assert hours["n"] < hours["span"]


def test_panel_series_shapes(spark):
    df = panel_series(spark, n_series=10, min_length=50, max_length=60, n_static=2)
    pdf = df.toPandas()
    lens = pdf.groupby("unique_id").size()
    assert lens.between(50, 60).all()
    assert pdf.groupby("unique_id")["static_0"].nunique().eq(1).all()
    # equal ends
    assert pdf.groupby("unique_id")["ds"].max().nunique() == 1


def test_intermittent_series(spark):
    pdf = intermittent_series(spark, n_series=20, length=100).toPandas()
    frac_zero = (pdf["y"] == 0).mean()
    assert 0.7 < frac_zero < 0.95
    assert (pdf[pdf.unique_id == "sparse_0"]["y"] == 0).all()
