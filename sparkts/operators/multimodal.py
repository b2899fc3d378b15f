"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` payload columns with a
typed metadata struct — the pattern a 100 TB training-data pipeline needs:
the JVM never interprets the bytes (no codec on the scan path, full column
pruning), and all interpretation happens in Arrow-batched Python via
``mapInPandas`` with bounded batch memory.

The actual byte-level decoders (PIL/ffmpeg/torchaudio) are NOT available in
this environment, so ``decode`` is a clearly-marked STUB: by default it
raises NotImplementedError; with ``fake=True`` it produces a deterministic
pure-function-of-bytes pseudo-decode so the surrounding Spark plumbing —
schema derivation, batching, partition sizing, downstream feature columns —
is real and testable end-to-end. Swapping in a real decoder changes ONE
function body and nothing else.

Operators:
* ``attach_media_meta``  — typed metadata struct (codec-free: size, xxhash,
  magic-byte sniff) computed JVM-side, no Python.
* ``decode_features``    — mapInPandas: payload → fixed-dim float feature
  vector (stub/fake), batch-bounded.
* ``resize_images`` / ``sample_frames`` — same shape, stubbed transforms
  that document the real UDF signatures.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

#: magic-byte prefixes → media type (JVM-side sniff, no UDF)
_MAGIC = {
    "jpeg": bytes.fromhex("ffd8ff"),
    "png": bytes.fromhex("89504e47"),
    "gif": b"GIF8",
    "riff": b"RIFF",  # wav/avi containers
    "mp4": b"\x00\x00\x00",  # ftyp boxes start with a 4-byte size
}


def attach_media_meta(df: DataFrame, payload_col: str = "media") -> DataFrame:
    """Typed metadata struct computed with built-in expressions only:
    (n_bytes, xxhash64, sniffed_type). Keeps the scan JVM-side — at scale
    the metadata pass must not deserialize payloads into Python."""
    p = F.col(payload_col)
    sniff = F.when(
        F.substring(p, 1, 3) == F.lit(_MAGIC["jpeg"]), "image/jpeg"
    ).when(
        F.substring(p, 1, 4) == F.lit(_MAGIC["png"]), "image/png"
    ).when(
        F.substring(p, 1, 4) == F.lit(_MAGIC["gif"]), "image/gif"
    ).when(
        F.substring(p, 1, 4) == F.lit(_MAGIC["riff"]), "audio/riff"
    ).otherwise("application/octet-stream")
    meta = F.struct(
        F.length(p).alias("n_bytes"),
        F.xxhash64(p).alias("content_hash"),
        sniff.alias("sniffed_type"),
    )
    return df.withColumn("media_meta", meta)


def _fake_decode(buf: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-decode: bytes → dim-float vector. Pure function
    of content (so tests are partition-independent); NOT a real decoder.
    feature_i = ((md5_32(buf)·(i+1)) mod 2^24) / 2^24 — md5-derived so the
    driver's SQL oracle reproduces the values exactly (no wrap-around
    arithmetic; products stay < 2^39)."""
    import hashlib

    base = int(hashlib.md5(buf).hexdigest()[:8], 16)
    i = np.arange(1, dim + 1, dtype=np.int64)
    return ((base * i) % (1 << 24)).astype(np.float32) / float(1 << 24)


def decode_features(
    df: DataFrame,
    payload_col: str = "media",
    dim: int = 64,
    fake: bool = False,
    batch_rows: int = 256,
) -> DataFrame:
    """payload binary → ``features array<float>`` via ``mapInPandas``.

    STUB: real image/audio decoding libraries are not present in this
    container. ``fake=False`` raises NotImplementedError inside the worker
    (the documented contract for swapping in PIL/ffmpeg); ``fake=True``
    uses the deterministic pseudo-decode so the plumbing is testable.

    ``batch_rows`` caps rows per Arrow batch — payloads are large, so batch
    memory = batch_rows × avg_payload, independent of partition size.
    """
    out_fields = df.schema.fields + [
        T.StructField("features", T.ArrayType(T.FloatType()), True)
    ]
    schema = T.StructType(out_fields)
    cols = [f.name for f in df.schema.fields]

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for s in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[s : s + batch_rows].copy()
                if not fake:
                    raise NotImplementedError(
                        "media decode requires PIL/ffmpeg — unavailable in "
                        "this environment; pass fake=True for the "
                        "deterministic test decode")
                chunk["features"] = [
                    _fake_decode(bytes(b), dim) for b in chunk[payload_col]
                ]
                yield chunk[cols + ["features"]]

    return df.mapInPandas(mapper, schema)


def resize_images(df: DataFrame, payload_col: str = "media",
                  width: int = 224, height: int = 224) -> DataFrame:
    """STUB of the image-resize transform: real implementation decodes,
    resizes and re-encodes inside the same mapInPandas shape as
    decode_features. Raises at execution time (not plan time)."""

    schema = df.schema

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            f"resize_images({width}x{height}) needs an image codec — "
            "unavailable in this environment")
        yield  # pragma: no cover

    return df.mapInPandas(mapper, schema)


def sample_frames(df: DataFrame, payload_col: str = "media",
                  every_n: int = 30) -> DataFrame:
    """STUB of video frame sampling: real implementation explodes each
    video payload into (frame_idx, frame binary) rows. The output schema —
    the part Spark needs at plan time — is real."""
    out = T.StructType(
        df.schema.fields
        + [T.StructField("frame_idx", T.IntegerType(), True),
           T.StructField("frame", T.BinaryType(), True)]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            f"sample_frames(every_n={every_n}) needs ffmpeg — unavailable "
            "in this environment")
        yield  # pragma: no cover

    return df.mapInPandas(mapper, out)
