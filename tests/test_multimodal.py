"""Multimodal binary-column plumbing: JVM-side metadata sniff, mapInPandas
feature decode (deterministic fake), stub contracts for resize/frames."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkts.operators import (
    attach_media_meta,
    decode_features,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("a", bytes.fromhex("ffd8ff") + b"fakejpegbytes" * 10),
        ("b", bytes.fromhex("89504e47") + b"fakepngbytes" * 20),
        ("c", b"RIFF" + b"fakewav" * 5),
        ("d", b"plain text payload"),
    ]
    return spark.createDataFrame(rows, "id string, media binary")


def test_metadata_sniff_jvm_side(spark, media_df):
    out = attach_media_meta(media_df).select("id", "media_meta.*").toPandas()
    got = dict(zip(out["id"], out["sniffed_type"]))
    assert got == {"a": "image/jpeg", "b": "image/png", "c": "audio/riff",
                   "d": "application/octet-stream"}
    assert (out["n_bytes"] > 0).all()
    # no Python UDF in the plan
    plan = attach_media_meta(media_df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_decode_features_fake(spark, media_df):
    out = decode_features(media_df, fake=True, dim=16).toPandas()
    assert len(out) == 4
    feats = np.vstack(out["features"].to_numpy())
    assert feats.shape == (4, 16)
    assert np.isfinite(feats).all()
    # deterministic: same content → same features under any partitioning
    out2 = decode_features(media_df.repartition(4), fake=True, dim=16).toPandas()
    m1 = dict(zip(out["id"], out["features"]))
    m2 = dict(zip(out2["id"], out2["features"]))
    for k in m1:
        np.testing.assert_array_equal(m1[k], m2[k])


def test_decode_without_fake_raises_in_worker(spark, media_df):
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        decode_features(media_df, fake=False).collect()


def test_stub_transforms_have_real_schemas(spark, media_df):
    r = resize_images(media_df)
    assert r.schema == media_df.schema  # plan-time schema is real
    s = sample_frames(media_df)
    assert "frame_idx" in s.columns and "frame" in s.columns
    with pytest.raises(Exception):
        s.collect()  # execution hits the documented stub
