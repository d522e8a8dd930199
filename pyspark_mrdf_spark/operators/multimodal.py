"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

North-star "multimodal columns" for a training-data pipeline: images /
audio / video ride through the engine as ``BinaryType`` columns with a
typed metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched ``mapInPandas`` kernels so the payload bytes never leave
the executors and the work parallelizes per input partition.

The actual image/audio codecs are NOT installed in this container, so
the decode kernel here is a **clearly-marked deterministic fake**
(byte-level features computed from the real payload bytes) and the
real-codec entry point is stubbed behind ``NotImplementedError``
(``decode_image``). Everything Spark-side — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested; swapping the fake
for PIL/libvips/ffmpeg changes only the per-row kernel body.

Payloads are derived deterministically from ``documents.text`` (UTF-8
bytes) because the harness ships no binary fixtures; at 100 TB the
same plumbing reads parquet ``binary`` columns written by an upstream
crawler (scan → mapInPandas stays identical, and Parquet stores the
bytes unencoded either way).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FRAME_BYTES = 256

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_sum", LongType(), False),
        StructField("max_byte", IntegerType(), False),
        StructField("min_byte", IntegerType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def attach_payloads(docs: DataFrame) -> DataFrame:
    """documents → multimodal table: (doc_id, modality, payload, meta).

    All JVM-side Column expressions (no UDF): payload = UTF-8 bytes of
    the text; modality assigned round-robin by doc_id; ``meta`` is the
    typed metadata struct (mime, byte_len, width, height, sample_rate,
    n_frames) an upstream decoder would have recorded."""
    payload = F.encode("text", "UTF-8")
    byte_len = F.octet_length(payload).cast("bigint")
    mod3 = F.col("doc_id") % 3
    modality = (
        F.when(mod3 == 0, F.lit("image"))
        .when(mod3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    mime = (
        F.when(mod3 == 0, F.lit("image/png"))
        .when(mod3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    return docs.select(
        "doc_id",
        modality.alias("modality"),
        payload.alias("payload"),
        F.struct(
            mime.alias("mime"),
            byte_len.alias("byte_len"),
            (64 + F.col("doc_id") % 64).cast("int").alias("width"),
            (64 + (F.col("doc_id") * 7) % 64).cast("int").alias("height"),
            (8000 + 1000 * (F.col("doc_id") % 5)).cast("int").alias("sample_rate"),
            F.ceil(byte_len / FRAME_BYTES).cast("bigint").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real image decode — **STUB**. Image codecs (pillow / opencv /
    libvips) are not installed in this container. The surrounding
    Spark plumbing is identical for a real decoder; replace this body
    with e.g. ``PIL.Image.open(io.BytesIO(payload))``."""
    try:
        import PIL.Image  # noqa: F401  (absent in this container)
    except ImportError as exc:
        raise NotImplementedError(
            "image codec unavailable (STUB): install pillow and decode here"
        ) from exc
    raise NotImplementedError("real decode intentionally not wired in tests")


def decode_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Deterministic-fake "decode": byte-level features per payload.

    mapInPandas kernel — one Arrow batch in, one feature frame out;
    NumPy over the raw bytes stands in for the codec (see module
    docstring). Scales with input partitions; no shuffle."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = np.frombuffer(payload, dtype=np.uint8)
                rows.append(
                    (
                        int(doc_id),
                        int(b.size),
                        int(b.sum()),
                        int(b.max()) if b.size else 0,
                        int(b.min()) if b.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "byte_sum", "max_byte", "min_byte"]
            )

    return df.select("doc_id", payload_col).mapInPandas(_decode, FEATURE_SCHEMA)


def embed_payloads(df: DataFrame, dim: int = 64, payload_col: str = "payload") -> DataFrame:
    """Multimodal → vector bridge: (doc_id, embedding array<float>) —
    the shape of batch model inference in a training-data pipeline.

    The "model" is a deterministic fake (L2-normalized ``dim``-bucket
    byte histogram of the real payload), standing in for an ONNX/torch
    encoder exactly like ``decode_features`` stands in for a codec:
    identical Spark plumbing (Arrow batches in, fixed-width float
    vectors out, no shuffle, scales with input partitions), so the
    output feeds ``knn_search`` / ``ann_ivf`` / ``embedding_near_dups``
    unchanged. Identical payloads ⇒ identical embeddings — near-dup
    laws hold end-to-end (tested)."""
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType(), False), False),
        ]
    )

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for payload in pdf[payload_col]:
                b = np.frombuffer(payload, dtype=np.uint8)
                h = np.bincount(b % dim, minlength=dim).astype(np.float64) if b.size else np.zeros(dim)
                n = np.linalg.norm(h)
                out.append((h / n if n else h).astype(np.float32))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "embedding": out}
            )

    return df.select("doc_id", payload_col).mapInPandas(_embed, schema)


def frame_sample(
    df: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    every_n: int = 4,
    payload_col: str = "payload",
) -> DataFrame:
    """Video-style frame sampling: split each payload into fixed-size
    frames, keep every ``every_n``-th → (doc_id, frame_idx, frame).

    The row-explode happens inside the executor (mapInPandas), so a
    1 GB video becomes frames without ever concatenating driver-side;
    downstream per-frame decode is another mapInPandas over the
    ``frame`` binary column."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(payload[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select("doc_id", payload_col).mapInPandas(_frames, FRAME_SCHEMA)
