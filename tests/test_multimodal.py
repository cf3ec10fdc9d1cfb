"""Multimodal plumbing: mapInPandas feature extraction over binary columns
must be deterministic, partition-independent, and schema-stable."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.operators import (
    multimodal as MM,
)
from sport_advantages_moderne_data_infrastructure_spark.sources.tables import (
    load_table,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return MM.synth_media(load_table(spark, sf_dir, "documents"))


def test_fake_decode_shape_and_determinism(spark, media):
    feats = MM.fake_decode_features(media)
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert len(rows) == media.count()
    r0 = rows[0]
    assert r0["n_bytes"] == 16
    assert 0.0 <= r0["mean_byte"] <= 255.0
    assert len(r0["head_hex"]) == 8
    # deterministic across runs
    again = {r["doc_id"]: r for r in MM.fake_decode_features(media).collect()}
    assert rows == again


def test_fake_decode_partition_independence(spark, media):
    one = {r["doc_id"]: r["mean_byte"]
           for r in MM.fake_decode_features(media.repartition(1)).collect()}
    many = {r["doc_id"]: r["mean_byte"]
            for r in MM.fake_decode_features(media.repartition(13)).collect()}
    assert one == many


def test_head_hex_matches_blob(spark, media):
    feats = MM.fake_decode_features(media)
    joined = feats.join(MM.media_meta(media), "doc_id")
    bad = joined.filter(
        F.col("head_hex") != F.substring("blob_hex", 1, 8)).count()
    assert bad == 0


def test_real_decode_is_stubbed(spark, media):
    with pytest.raises(NotImplementedError):
        MM.decode_image(media)


def test_png_roundtrip_and_crc_guard(spark, sf_dir):
    """The PNG codec is REAL: encode (filters + zlib + CRC) → decode
    (chunk walk + CRC verify + inflate + unfilter) reproduces the exact
    generator pixels, and a single flipped byte in the IDAT body is
    caught by the CRC check, not silently decoded."""
    from sport_advantages_moderne_data_infrastructure_spark.sources.tables import (
        load_table,
    )
    docs = load_table(spark, sf_dir, "documents").limit(20)
    png = MM.synth_png(docs)
    feats = {r["doc_id"]: r
             for r in MM.decode_png_features(png).collect()}
    for doc_id, r in feats.items():
        w, h = 4 + doc_id % 5, 2 + doc_id % 4
        n = 3 * w * h
        assert (r["width"], r["height"], r["n_pixel_bytes"]) == (w, h, n)
        assert r["pixel_sum"] == sum(
            (doc_id * 11 + 3 * i) % 247 for i in range(n))
        assert r["filter_mix"] == sum(rr % 5 for rr in range(h))

    # corrupt one IDAT payload byte → CRC mismatch must raise
    blob = bytearray(png.limit(1).collect()[0]["blob"])
    idat_at = bytes(blob).index(b"IDAT")
    blob[idat_at + 6] ^= 0xFF
    import pytest as _pytest
    with _pytest.raises(Exception, match="CRC|PNG"):
        MM.decode_png_features(
            spark.createDataFrame([(0, bytes(blob))], "doc_id long, blob binary")
        ).collect()
