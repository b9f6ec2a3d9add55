"""Multimodal plumbing: Arrow-batched binary transforms (feature extraction,
resize, frame sampling) — schema, batching, 1:N fan-out, determinism."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from daq_3i_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def packed(spark, sf_dir):
    from daq_3i_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("mime"),
        F.expr("encode(text, 'utf-8')").alias("payload"),
    ).cache()


def test_decode_is_documented_stub():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image/png")


def test_features_deterministic(spark, packed):
    a = {r["doc_id"]: r["features"] for r in extract_features(packed).collect()}
    b = {
        r["doc_id"]: r["features"]
        for r in extract_features(packed.repartition(7)).collect()
    }
    assert a == b  # partitioning must not change features
    assert all(len(v) == FEATURE_DIM for v in a.values())


def test_resize_bounds(spark, packed):
    out = resize_media(packed, target_bytes=64).collect()
    assert len(out) == packed.count()
    assert all(0 < r["n_bytes"] <= 64 for r in out)


def test_frame_sampling_fanout(spark, packed):
    frames = sample_frames(packed, n_frames=4, frame_bytes=16)
    counts = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in counts)
    sizes = frames.select(F.octet_length("frame").alias("n")).distinct().collect()
    assert {r["n"] for r in sizes} == {16}
