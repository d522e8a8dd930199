"""fvecs / ivecs binary connectors (TexMex benchmark formats).

Per record: one little-endian int32 ``dim`` followed by ``dim``
float32 (fvecs) or int32 (ivecs) components — the reference's input
format (reference utilities.py:46-143).

The reference decoded entire files IN THE DRIVER through a Python
generator handed to ``sc.parallelize`` (reference main.py:31,
utilities.py:46-65), capping input size at driver memory — the
documented cluster failure mode. Here decoding happens on executors:
``spark.read.format("binaryFile")`` ships file bytes to tasks and a
``mapInPandas`` decoder emits (id, vec) rows. Files are the split
unit — one task per file; for 100 TB corpora store many shard files
(the format itself has no record index, so intra-file splitting would
need a scan anyway; shard-per-task is the scalable layout, exactly
how SIFT1B ships as shards).

Row ids are ``shard_offset + position`` so multi-file corpora keep
the reference's "node id = global position" contract when shards are
named in order.
"""

from __future__ import annotations

import io
import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FVECS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
    ]
)
IVECS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("components", ArrayType(IntegerType(), False), False),
    ]
)


def _decode(content: bytes, dtype: np.dtype) -> list[np.ndarray]:
    """Decode one whole file's records; truncated tails are dropped
    (the reference's behavior, utilities.py:55-56)."""
    out = []
    off, n = 0, len(content)
    while off + 4 <= n:
        (dim,) = struct.unpack_from("<i", content, off)
        if dim <= 0 or off + 4 + 4 * dim > n:
            break
        out.append(np.frombuffer(content, dtype=dtype, count=dim, offset=off + 4).copy())
        off += 4 + 4 * dim
    return out


def read_fvecs(
    spark: SparkSession, path: str, *, input_max: int = 0
) -> DataFrame:
    """Distributed fvecs scan → DataFrame(vec_id, embedding)
    (reference parse_fvecs_stream*, utilities.py:46-104; the tree-path
    column of S1 is MRDF-internal and added by the algorithm)."""
    return _read_vecs(spark, path, np.float32, FVECS_SCHEMA, "embedding", input_max)


def read_ivecs(
    spark: SparkSession, path: str, *, input_max: int = 0, k: int = 0
) -> DataFrame:
    """Distributed ivecs scan → DataFrame(vec_id, components);
    ``k`` > 0 truncates each row to its first k components
    (reference parse_ivecs_stream, utilities.py:106-129)."""
    df = _read_vecs(spark, path, np.int32, IVECS_SCHEMA, "components", input_max)
    if k > 0:
        df = df.withColumn("components", F.slice("components", 1, k))
    return df


def _header_dim(spark: SparkSession, path: str) -> int:
    """First record's ``dim``: a 4-byte read through the Hadoop
    FileSystem API (driver-side, works on any supported FS — local,
    HDFS, S3A). 4 bytes of I/O per shard, never the content."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(jpath)
    try:
        b = [stream.read() for _ in range(4)]
    finally:
        stream.close()
    if any(x < 0 for x in b):  # shorter than one header
        return 0
    (dim,) = struct.unpack("<i", bytes(b))
    return dim


def _read_vecs(spark, path, np_dtype, schema, col, input_max):
    files = spark.read.format("binaryFile").load(path)
    # deterministic shard offsets: records are uniform-width within a
    # shard (TexMex layout), so each shard's record count is
    # length // (4 + 4·dim) after one 4-byte header read — prefix-sum
    # in filename order. No content pass: round 1 ran a full
    # distributed decode of every file just to compute these offsets,
    # doubling I/O+CPU on exactly the sharded corpora this targets.
    sizes = [
        (r["path"], r["length"]) for r in files.select("path", "length").collect()
    ]
    sizes.sort()
    if len(sizes) > 1:
        offsets, counts, acc = {}, {}, 0
        for p, length in sizes:
            offsets[p] = acc
            dim = _header_dim(spark, p)
            counts[p] = length // (4 + 4 * dim) if dim > 0 else 0
            acc += counts[p]
    else:
        offsets = {sizes[0][0]: 0} if sizes else {}
        counts = {}

    b_off = spark.sparkContext.broadcast((offsets, counts))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                vecs = _decode(row["content"], np_dtype)
                offs, cnts = b_off.value
                base = offs.get(row["path"], 0)
                # header-arithmetic counts assume uniform well-formed
                # records; a malformed shard would silently shift every
                # later shard's global ids — fail loudly instead
                expect = cnts.get(row["path"])
                if expect is not None and len(vecs) != expect:
                    raise ValueError(
                        f"shard {row['path']}: decoded {len(vecs)} records, "
                        f"header arithmetic expected {expect} — malformed or "
                        "ragged-dim shard; global ids would misalign"
                    )
                if not vecs:
                    continue
                yield pd.DataFrame(
                    {
                        "vec_id": np.arange(base, base + len(vecs), dtype=np.int64),
                        col: [v for v in vecs],
                    }
                )

    df = files.select("path", "content").mapInPandas(_gen, schema)
    if input_max > 0:
        df = df.filter(F.col("vec_id") < input_max)
    return df


def write_fvecs_local(path: str, mat: np.ndarray) -> None:
    """Local fvecs writer for fixtures/round-trip tests (reference
    write_fvecs, utilities.py:32-40)."""
    mat = np.asarray(mat, dtype=np.float32)
    with open(path, "wb") as f:
        for row in mat:
            f.write(struct.pack("<i", len(row)))
            f.write(row.tobytes())


def write_ivecs_local(path: str, mat: np.ndarray) -> None:
    mat = np.asarray(mat, dtype=np.int32)
    with open(path, "wb") as f:
        for row in mat:
            f.write(struct.pack("<i", len(row)))
            f.write(row.tobytes())


def write_adjacency_json(g: DataFrame, path: str) -> None:
    """Graph sink: adjacency rows as JSON lines (replaces the
    reference's Python-repr text sink, main.py:46 — JSON is
    re-readable by any engine, repr was parsed back with
    ast.literal_eval, getrecall.py:25-26)."""
    from pyspark_mrdf_spark.algorithms.mrdf import format_adjacency

    format_adjacency(g).write.mode("overwrite").json(path)


def read_adjacency_json(spark: SparkSession, path: str) -> DataFrame:
    """Graph scan matching ``write_adjacency_json`` (reference S9)."""
    return spark.read.json(path).select(
        F.col("id").cast("long"),
        F.col("neighbors").cast("array<long>"),
    )
