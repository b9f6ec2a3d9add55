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


def test_decode_unsupported_mime_raises():
    # compressed codecs stay behind the documented capability gate
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image/png")


def test_decode_ppm_golden():
    # 2x2 P6: pixels (R,G,B) = (0,1,2),(3,4,5) / (6,7,8),(9,10,11)
    payload = b"P6\n2 2\n255\n" + bytes(range(12))
    img = decode_media(payload, "image/x-portable-pixmap")
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [0, 1, 2]
    assert img[1, 1].tolist() == [9, 10, 11]


def test_decode_pgm_with_comment_header():
    payload = b"P5\n# a comment line\n3 1\n255\n\x0a\x14\x1e"
    img = decode_media(payload, "image/x-portable-graymap")
    assert img.shape == (1, 3, 1)
    assert img[0, :, 0].tolist() == [10, 20, 30]


def test_decode_rejects_malformed():
    with pytest.raises(ValueError):
        decode_media(b"GIF89a....", "image/x-portable-pixmap")
    with pytest.raises(ValueError):
        decode_media(b"P6\nxx\n255\n", "image/x-portable-pixmap")


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


def test_codec_registry_dispatch_and_override():
    """decode_media dispatches through the plug-in registry: a custom codec
    registered for a new mime is called from the same entry point the
    registry ops use, an unregistered mime still raises, and the built-in
    netpbm path keeps working (so a user codec cannot silently shadow it)."""
    import numpy as np

    from daq_3i_spark.functions.multimodal import (
        _CODECS,
        decode_media,
        register_codec,
    )

    sentinel = np.zeros((2, 3, 1), dtype=np.uint8)
    assert "image/x-test" not in _CODECS
    try:
        register_codec("image/x-test", lambda payload: sentinel)
        out = decode_media(b"anything", "image/x-test")
        assert out is sentinel
    finally:
        _CODECS.pop("image/x-test", None)

    with pytest.raises(NotImplementedError):
        decode_media(b"anything", "image/x-test")

    pgm = b"P5 3 2 255\n" + bytes(range(6))
    img = decode_media(pgm, "image/x-portable-graymap")
    assert img.shape == (2, 3, 1) and img.flatten().tolist() == list(range(6))


def test_pil_codecs_are_opt_in_and_import_gated():
    """JPEG/PNG decode must never light up implicitly (oracled ops promise
    bit-portable output): without Pillow, enable_pil_codecs() returns False
    and registers nothing; with a stub Pillow in sys.modules, the SAME call
    registers both mimes and decode_media dispatches into it — proving the
    import-gated branch works without shipping codec libraries."""
    import sys

    import numpy as np

    from daq_3i_spark.functions import multimodal as mm

    # this sandbox has no Pillow: the gate must refuse and stay side-effect-free
    assert "PIL" not in sys.modules
    assert mm.enable_pil_codecs() is False
    assert "image/jpeg" not in mm._CODECS and "image/png" not in mm._CODECS

    class _FakeImg:
        mode = "RGB"

        def __array__(self, dtype=None, copy=None):
            return np.arange(3, dtype=np.uint8).reshape(1, 1, 3)

    fake_pil = type(sys)("PIL")
    fake_image_mod = type(sys)("PIL.Image")
    fake_image_mod.open = lambda fp: _FakeImg()
    fake_pil.Image = fake_image_mod
    sys.modules["PIL"] = fake_pil
    sys.modules["PIL.Image"] = fake_image_mod
    try:
        assert mm.enable_pil_codecs() is True
        assert "image/jpeg" in mm._CODECS and "image/png" in mm._CODECS
        out = mm.decode_media(b"\xff\xd8fakejpeg", "image/jpeg")
        assert out.shape == (1, 1, 3) and out.tolist() == [[[0, 1, 2]]]
    finally:
        for mime in ("image/jpeg", "image/png"):
            mm._CODECS.pop(mime, None)
        sys.modules.pop("PIL", None)
        sys.modules.pop("PIL.Image", None)
