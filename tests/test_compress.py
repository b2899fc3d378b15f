"""Codec: encode∘decode == identity (property-tested) + Spark round-trip +
compression-ratio sanity."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sparkts.operators.compress import (
    _pack_fields,
    _sig_bits,
    _unpack_fields,
    compress_tier,
    decode_series,
    decompress_tier,
    encode_series,
)


def test_sig_bits():
    x = np.array([0, 1, 2, 3, 4, 255, 256, 2**63, 2**64 - 1], dtype=np.uint64)
    assert _sig_bits(x).tolist() == [0, 1, 2, 2, 3, 8, 9, 64, 64]


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 2**62, 500).astype(np.uint64)
    nbits = _sig_bits(vals)
    buf = _pack_fields(vals, nbits)
    back = _unpack_fields(buf, nbits)
    assert (back == vals).all()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.floats(allow_nan=False, width=64), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=3600),
)
def test_encode_decode_identity(vals, step):
    """Property: decode(encode(ts, vals)) == (ts, vals) bit-for-bit."""
    n = len(vals)
    ts = np.arange(n, dtype=np.int64) * step + 1_700_000_000
    v = np.array(vals, dtype=np.float64)
    t0, m, tp, vp = encode_series(ts, v)
    ts2, v2 = decode_series(t0, m, tp, vp)
    assert (ts2 == ts).all()
    assert v2.view(np.uint64).tolist() == v.view(np.uint64).tolist()  # bitwise


def test_irregular_timestamps():
    rng = np.random.RandomState(9)
    ts = np.cumsum(rng.randint(1, 10**6, 1000)).astype(np.int64)
    v = rng.randn(1000)
    t0, n, tp, vp = encode_series(ts, v)
    ts2, v2 = decode_series(t0, n, tp, vp)
    assert (ts2 == ts).all()
    np.testing.assert_array_equal(v2, v)


def test_compression_ratio_regular_series():
    """Regular hourly buckets + smooth values must beat raw 16 B/point
    comfortably on the timestamp side and overall."""
    n = 5000
    ts = np.arange(n, dtype=np.int64) * 3600
    v = np.round(np.sin(np.arange(n) / 24.0) * 100, 2)
    t0, m, tp, vp = encode_series(ts, v)
    enc = len(tp) + len(vp)
    assert enc < 16 * n * 0.75, f"ratio too weak: {enc} vs {16 * n}"
    # timestamps alone: ~1 byte/pt incl. the 7-bit length stream
    assert len(tp) < 1.5 * n


def test_spark_roundtrip(spark, sf_dir):
    from sparkts.operators import rollup_base

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    tier = rollup_base(ev, "ts", ["event_type"], "value", "1h")
    seg = compress_tier(tier, ["event_type"], "bucket", "v_sum")
    segs = seg.toPandas()
    assert (segs["enc_bytes"] < segs["raw_bytes"]).all()
    back = decompress_tier(
        spark.createDataFrame(segs), ["event_type"], "bucket", "v_sum"
    )
    a = tier.select("event_type", "bucket", "v_sum").orderBy(
        "event_type", "bucket"
    ).toPandas()
    b = back.orderBy("event_type", "bucket").toPandas()
    assert len(a) == len(b)
    assert (a["event_type"].to_numpy() == b["event_type"].to_numpy()).all()
    assert (
        a["bucket"].to_numpy().astype("datetime64[s]")
        == b["bucket"].to_numpy().astype("datetime64[s]")
    ).all()
    np.testing.assert_array_equal(a["v_sum"].to_numpy(), b["v_sum"].to_numpy())
