"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the content is an opaque
``binary`` column beside typed metadata (mime, byte length, digest), and
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the Python boundary is crossed once per batch, not
per row (vectorized, zero-copy via Arrow).

Decoding goes through a CODEC REGISTRY keyed by mime type: the netpbm
formats (image/x-portable-{gray,pix}map) decode for real in pure numpy
(built-in, dependency-free, so the oracled ops stay bit-portable), and
richer codecs (Pillow JPEG/PNG) are an explicit opt-in via
:func:`enable_pil_codecs` / ``DAQ3I_PIL_CODECS=1`` — :func:`decode_media`
raises only for a mime with no registered codec (a real error path, not a
stub).
:func:`extract_features` computes a *deterministic* 8-dim byte-statistics
feature vector so feature plumbing — schema, batch iteration, partition
preservation — is testable without any codec at all.

Scale notes: mapInPandas preserves partitioning (no shuffle); batch size is
governed by spark.sql.execution.arrow.maxRecordsPerBatch; the feature
computation is numpy-vectorized within each batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


_PNM_MAGIC = {b"P5": ("image/x-portable-graymap", 1), b"P6": ("image/x-portable-pixmap", 3)}


def _parse_pnm_header(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse a binary PNM (P5/P6) header: returns (channels, width, height,
    maxval, data_offset).  Public format, netpbm spec: magic, then
    whitespace/comment-separated width height maxval, then ONE whitespace
    byte, then raw samples."""
    if payload[:2] not in _PNM_MAGIC:
        raise ValueError(f"not a binary PNM payload: magic {payload[:2]!r}")
    channels = _PNM_MAGIC[payload[:2]][1]
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("malformed PNM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    width, height, maxval = fields[0], fields[1], fields[2]
    return channels, width, height, maxval, pos


#: plug-in codec registry: mime -> bytes-in/ndarray-out decoder.  Users with
#: codec libraries installed register decoders here (or opt in to Pillow via
#: enable_pil_codecs below) and every registry op that decodes media —
#: op_multimodal_decode and anything built on decode_media — picks them up
#: with no plan change, because the lookup happens inside the Arrow batch.
_CODECS: dict[str, object] = {}


def register_codec(mime: str, decoder) -> None:
    """Register ``decoder(payload: bytes) -> np.ndarray (H, W, C) uint8``
    for a mime type.  Later registrations win (so a user can override the
    built-ins)."""
    _CODECS[mime] = decoder


def _decode_pnm(payload: bytes) -> np.ndarray:
    channels, width, height, maxval, off = _parse_pnm_header(payload)
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    need = width * height * channels
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return data.reshape(height, width, channels)


register_codec("image/x-portable-pixmap", _decode_pnm)
register_codec("image/x-portable-graymap", _decode_pnm)


def enable_pil_codecs() -> bool:
    """Opt-in JPEG/PNG decode via Pillow: registers ``_decode_pil`` for
    ``image/jpeg``/``image/png`` and returns True iff Pillow imported.

    Deliberately NOT automatic on import: oracled registry ops promise
    bit-portable output (the DuckDB oracle recomputes every value), and a
    PIL decode has no oracle counterpart — auto-registration would make an
    oracled op's output depend on whether Pillow happens to be installed.
    Call this (or set ``DAQ3I_PIL_CODECS=1`` before import) only for
    non-oracled user pipelines that accept engine-specific decodes."""
    try:
        from PIL import Image as _PILImage
        import io as _io
    except ImportError:  # pragma: no cover - exercised via the stub test
        return False

    def _decode_pil(payload: bytes) -> np.ndarray:  # pragma: no cover
        img = _PILImage.open(_io.BytesIO(payload))
        arr = np.asarray(img.convert("RGB") if img.mode not in ("L", "RGB") else img)
        return arr if arr.ndim == 3 else arr[:, :, None]

    register_codec("image/jpeg", _decode_pil)
    register_codec("image/png", _decode_pil)
    return True


if os.environ.get("DAQ3I_PIL_CODECS") == "1":  # pragma: no cover - env opt-in
    enable_pil_codecs()


def decode_media(payload: bytes, mime: str) -> np.ndarray:
    """Decode an image payload to an (H, W, C) uint8 sample array.

    Dispatches through the plug-in codec registry (:func:`register_codec`).
    Built in with no codec deps: the binary netpbm formats
    ``image/x-portable-pixmap`` (PPM/P6, RGB) and
    ``image/x-portable-graymap`` (PGM/P5, gray), parsed in pure numpy.
    JPEG/PNG are opt-in via :func:`enable_pil_codecs` (or the
    ``DAQ3I_PIL_CODECS=1`` env var) so oracled ops stay bit-portable by
    default.  Unregistered mimes raise — compressed codecs plug in behind the
    same bytes-in/ndarray-out contract, called only from within an Arrow
    batch.
    """
    dec = _CODECS.get(mime)
    if dec is not None:
        return dec(payload)
    raise NotImplementedError(
        f"no codec registered for {mime!r} (see register_codec; JPEG/PNG "
        "need enable_pil_codecs() / DAQ3I_PIL_CODECS=1)"
    )


def _byte_features(payload: bytes) -> np.ndarray:
    """Deterministic feature vector from byte statistics (stands in for the
    real decoder's embedding; stable across runs and partitionings).

    Cross-engine determinism (the DuckDB oracle recomputes these): every
    float is derived from EXACT integer aggregates (sum, sum-of-squares,
    min, max, counts) through a fixed tree of correctly-rounded IEEE ops
    (divide, multiply, subtract, sqrt) — bit-identical to the same formula
    evaluated in SQL, no accumulation-order dependence."""
    if not payload:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    import math

    b = np.frombuffer(payload, dtype=np.uint8)
    n = b.size
    s = int(b.sum(dtype=np.int64))
    s2 = int((b.astype(np.int64) ** 2).sum(dtype=np.int64))
    mu = s / n
    var = s2 / n - mu * mu
    std = math.sqrt(var) if var > 0 else 0.0
    feats = np.array(
        [
            float(n),
            mu,
            std,
            float(int(b.min())),
            float(int(b.max())),
            int((b > 127).sum()) / n,
            float(b[0]),
            float(b[-1]),
        ],
        dtype=np.float64,
    )
    return feats.astype(np.float32)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)


def resize_media(packed: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize stage (image thumbnailing stand-in): deterministic byte-stride
    downsampling of the payload to ~target_bytes.  Real image resize would
    decode -> PIL.resize -> re-encode inside the same batch loop; the Spark
    plumbing (binary in, binary out, Arrow batches, no shuffle) is identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(payload: bytes) -> bytes:
                if not payload:
                    return b""
                stride = max(1, len(payload) // target_bytes)
                return bytes(payload[::stride][:target_bytes])

            out = pdf["payload"].map(shrink)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "payload": out,
                    "n_bytes": out.map(len).astype("int32"),
                }
            )

    return packed.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(packed: DataFrame, n_frames: int = 4, frame_bytes: int = 16) -> DataFrame:
    """Frame-sampling stage (video stand-in): emit n evenly-spaced fixed-size
    byte windows per payload — a 1:N flatMap through mapInPandas (each input
    row yields n output rows), exactly the shape a real video decoder uses.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if not payload:
                    continue
                step = max(1, (len(payload) - frame_bytes) // max(n_frames - 1, 1))
                for k in range(n_frames):
                    off = min(k * step, max(len(payload) - frame_bytes, 0))
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(k)
                    rows["frame"].append(bytes(payload[off : off + frame_bytes]))
            yield pd.DataFrame(rows)

    return packed.mapInPandas(run, schema=FRAMES_SCHEMA)


def extract_features(packed: DataFrame) -> DataFrame:
    """(doc_id, mime, payload binary) -> (doc_id, mime, n_bytes, features).

    Arrow-batched mapInPandas; numpy per batch; no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "features": payloads.map(_byte_features),
                }
            )

    return packed.mapInPandas(run, schema=FEATURES_SCHEMA)
