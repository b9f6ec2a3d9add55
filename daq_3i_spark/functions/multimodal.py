"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the content is an opaque
``binary`` column beside typed metadata (mime, byte length, digest), and
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the Python boundary is crossed once per batch, not
per row (vectorized, zero-copy via Arrow).

The image/audio codecs are not available in this environment, so the decode
step is a documented stub (:func:`decode_media` raises NotImplementedError);
:func:`extract_features` instead computes a *deterministic* 8-dim
byte-statistics feature vector so the full Spark plumbing — schema, batch
iteration, partition preservation — is real and testable.  Swapping in a real
decoder means replacing one pure function.

Scale notes: mapInPandas preserves partitioning (no shuffle); batch size is
governed by spark.sql.execution.arrow.maxRecordsPerBatch; the feature
computation is numpy-vectorized within each batch.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def decode_media(payload: bytes, mime: str) -> np.ndarray:
    """Decode an image/audio/video payload to a sample array.

    STUB: real codecs (PIL / soundfile / av) are not present in this
    environment.  The Spark-side contract is what matters: bytes in, ndarray
    out, called only from within an Arrow batch.
    """
    raise NotImplementedError(
        f"media decode for {mime!r} requires codec libraries not present here; "
        "extract_features uses deterministic byte statistics instead"
    )


def _byte_features(payload: bytes) -> np.ndarray:
    """Deterministic fake feature vector from byte statistics (stands in for
    the real decoder's embedding; stable across runs and partitionings)."""
    if not payload:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    n = float(b.size)
    feats = np.array(
        [
            n,
            b.mean(),
            b.std(),
            b.min(),
            b.max(),
            float(np.count_nonzero(b > 127)) / n,
            b[0],
            b[-1],
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
