"""Streaming sinks beyond append: ``foreachBatch`` upsert.

Append-mode file sinks can only add rows; aggregations that REVISE
previous results (per-user running totals, dimension tables fed by a
stream) need a MERGE-style sink. ``foreachBatch`` hands each
micro-batch to ordinary batch code, so the existing
``io.upsert_parquet`` primitive (anti-join + union + rewrite — what
Delta/Iceberg MERGE does per file group) becomes the streaming upsert,
with the checkpoint giving exactly-once batch ids.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def upsert_stream_to_parquet(
    updates: DataFrame,
    key: str,
    base_path: str,
    checkpoint: str,
    query_name: str = "upsert_sink",
):
    """Run a streaming query that upserts each micro-batch into the
    parquet dataset at ``base_path`` by ``key`` (latest batch wins).

    Scale note: each batch rewrites only via anti-join + union — at
    production scale point this at a table format (Delta/Iceberg
    ``MERGE INTO``) where the same logic is file-group-local; the
    streaming plumbing (checkpointed foreachBatch) is identical."""
    spark = updates.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not os.path.exists(base_path) or not os.listdir(base_path):
            batch_df.write.mode("overwrite").parquet(base_path)
            return
        base = spark.read.parquet(base_path)
        merged = base.join(batch_df.select(key).distinct(), key, "left_anti").unionByName(
            batch_df
        )
        # write to a temp dir then swap: parquet reads its own input
        tmp = base_path.rstrip("/") + "._upsert_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        fresh = spark.read.parquet(tmp)
        fresh.write.mode("overwrite").parquet(base_path)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    return (
        updates.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
