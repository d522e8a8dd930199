"""JSONL document ingestion — the raw-crawl entry point of a
training-data pipeline (documents usually arrive as JSON lines long
before they are parquet).

Explicit schema (streaming-compatible, no inference pass over 100 TB)
and PERMISSIVE corrupt-record capture: malformed lines land in
``_corrupt_record`` instead of failing the job — at crawl scale some
fraction of input is always broken, and dropping it silently is as
wrong as crashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
        StructField("_corrupt_record", StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Distributed JSONL scan with corrupt-line capture."""
    return (
        spark.read.schema(DOC_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, corrupt_rows) — corrupt rows keep the raw line for
    quarantine/debugging; clean rows drop the capture column.

    The frame is cached first: Spark refuses queries that reference
    ONLY ``_corrupt_record`` on a raw JSON scan (the parser would have
    nothing else to parse), and both split branches re-scan otherwise."""
    df = df.cache()
    corrupt = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return clean, corrupt


def compact(spark: SparkSession, path: str, out_path: str, target_files: int) -> None:
    """Small-files compaction: rewrite a parquet dataset into
    ``target_files`` files. Long-running pipelines accrete thousands of
    tiny files per partition (one per micro-batch/task); scans then pay
    per-file open cost and lose splittability. Periodic compaction is
    table maintenance, same as Delta/Iceberg OPTIMIZE."""
    spark.read.parquet(path).repartition(target_files).write.mode("overwrite").parquet(
        out_path
    )
