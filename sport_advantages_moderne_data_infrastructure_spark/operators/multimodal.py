"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas iterators
(``mapInPandas``) — the 100 TB pattern for media pipelines: bytes never
leave the executor, Python sees zero-copy Arrow batches, and the decode
library is an isolated, swappable stage.

The container has no image/audio codecs, so the *real* decode is stubbed
behind ``NotImplementedError`` (clearly marked); ``fake_decode_features``
is a deterministic byte-level stand-in that keeps every piece of Spark
plumbing — schema, batch iteration, partitioning — real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FORMATS = ["png", "jpeg", "wav", "mp4"]


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table from ``documents``: 16-byte blob
    (md5 of the text) + typed metadata. Stands in for a real
    (bytes, metadata) lake table."""
    fmt = F.element_at(F.array(*[F.lit(x) for x in MEDIA_FORMATS]),
                       (F.col("doc_id") % 4 + 1).cast("int"))
    return documents.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("blob"),
        fmt.alias("media_format"),
        (16 + F.col("doc_id") % 16).cast("int").alias("width"),
        (16 + F.col("doc_id") % 9).cast("int").alias("height"),
    )


SYNTH_MEDIA_META_SQL = (
    # DuckDB twin of synth_media's observable metadata (blob surfaced as
    # lowercase hex — binary columns don't hash-compare across engines).
    "SELECT doc_id, lower(hex(unhex(md5(text)))) AS blob_hex, "
    "CAST(octet_length(unhex(md5(text))) AS INT) AS n_bytes, "
    "CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' "
    "WHEN 2 THEN 'wav' ELSE 'mp4' END AS media_format, "
    "CAST(16 + doc_id % 16 AS INT) AS width, "
    "CAST(16 + doc_id % 9 AS INT) AS height "
    "FROM documents"
)


def media_meta(media: DataFrame) -> DataFrame:
    """Metadata/fingerprint projection of a media table (oracle-checkable
    surface of the binary column)."""
    return media.select(
        "doc_id",
        F.lower(F.hex("blob")).alias("blob_hex"),
        F.octet_length("blob").cast("int").alias("n_bytes"),
        "media_format", "width", "height",
    )


_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("mean_byte", T.DoubleType()),
    T.StructField("max_byte", T.IntegerType()),
    T.StructField("head_hex", T.StringType()),
])


def fake_decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    mapInPandas — the real decode stage's exact plumbing (batch iterator in,
    batch iterator out; executors stream Arrow record batches)."""
    import numpy as np
    import pandas as pd

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            arrs = pdf["blob"].map(lambda b: np.frombuffer(b, dtype=np.uint8))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": arrs.map(len).astype("int32"),
                "mean_byte": arrs.map(lambda a: float(a.mean())),
                "max_byte": arrs.map(lambda a: int(a.max())).astype("int32"),
                "head_hex": pdf["blob"].map(lambda b: b[:4].hex()),
            })

    return media.select("doc_id", "blob").mapInPandas(
        _extract, schema=_FEATURES_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """REAL image decode — STUB. The container ships no codec libraries
    (no PIL/opencv); on a production cluster, swap the body for a
    mapInPandas stage exactly shaped like :func:`fake_decode_features`
    (bytes → decoded HxWxC features)."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires a codec library (PIL/opencv) not present "
            "in this environment; use fake_decode_features for plumbing tests"
        ) from e
    raise NotImplementedError("wire PIL decode here on a real deployment")
