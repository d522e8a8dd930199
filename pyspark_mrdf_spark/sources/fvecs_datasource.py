"""fvecs/ivecs as a first-class Spark data source (Spark 4 Python
DataSource API): ``spark.read.format("fvecs").load(path)``.

Upgrade over the binaryFile+mapInPandas connector in ``fvecs.py``:

- **O(1) partition planning.** fvecs records are uniform-width
  (dim from the first header word), so per-file row counts — and the
  global id offsets that preserve the reference's "node id = file
  position" contract (reference utilities.py:84-86) — come from file
  SIZE + one 4-byte header read, not a decode pass over every byte.
- **One InputPartition per shard file**, decoded executor-side; the
  driver never touches vector data (the reference decoded everything
  in the driver, main.py:31 — its documented scale failure).

Register once per session:  ``spark.dataSource.register(FvecsDataSource)``.
Options: ``format`` = fvecs (default) | ivecs.
"""

from __future__ import annotations

import glob
import os
import struct

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _ShardPartition(InputPartition):
    def __init__(self, path: str, base_id: int):
        self.path = path
        self.base_id = base_id


def _list_shards(path: str) -> list[str]:
    if os.path.isdir(path):
        files = [p for p in glob.glob(os.path.join(path, "*")) if os.path.isfile(p)]
    else:
        files = glob.glob(path)
    return sorted(files)


def _shard_rows(path: str) -> int:
    size = os.path.getsize(path)
    if size < 4:
        return 0
    with open(path, "rb") as fh:
        (dim,) = struct.unpack("<i", fh.read(4))
    if dim <= 0:
        return 0
    return size // (4 + 4 * dim)


class FvecsDataSource(DataSource):
    """``format("fvecs")``: (vec_id bigint, embedding array<float>) or,
    with ``option("format", "ivecs")``, (vec_id bigint, components
    array<int>)."""

    @classmethod
    def name(cls) -> str:
        return "fvecs"

    def schema(self) -> str:
        if self.options.get("format", "fvecs") == "ivecs":
            return "vec_id bigint, components array<int>"
        return "vec_id bigint, embedding array<float>"

    def reader(self, schema) -> DataSourceReader:
        return _VecsReader(self.options)


class _VecsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fvecs data source requires a load path")
        self.kind = options.get("format", "fvecs")

    def partitions(self):
        parts, acc = [], 0
        for f in _list_shards(self.path):
            parts.append(_ShardPartition(f, acc))
            acc += _shard_rows(f)
        if not parts:
            raise FileNotFoundError(f"no fvecs shards at {self.path}")
        return parts

    def read(self, partition: _ShardPartition):
        import numpy as np

        from pyspark_mrdf_spark.sources.fvecs import _decode

        dtype = np.int32 if self.kind == "ivecs" else np.float32
        with open(partition.path, "rb") as fh:
            content = fh.read()
        for i, vec in enumerate(_decode(content, dtype)):
            yield (partition.base_id + i, vec.tolist())
