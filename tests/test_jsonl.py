"""JSONL ingestion: corrupt-record quarantine and compaction."""

from __future__ import annotations

import glob
import json
import os

from pyspark_mrdf_spark.io import load_table
from pyspark_mrdf_spark.sources.jsonl import compact, read_documents_jsonl, split_corrupt


def test_jsonl_corrupt_record_quarantine(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    good = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11},
        {"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7},
    ]
    with open(p, "w") as f:
        for g in good:
            f.write(json.dumps(g) + "\n")
        f.write('{"doc_id": 3, "text": "broken...\n')  # truncated JSON
        f.write("not json at all\n")
    df = read_documents_jsonl(spark, p)
    clean, corrupt = split_corrupt(df)
    assert clean.count() == 2
    assert corrupt.count() == 2
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    d = str(tmp_path / "docs_export")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").json(d)
    back, corrupt = split_corrupt(read_documents_jsonl(spark, d))
    assert corrupt.count() == 0
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in back.collect()}
    b = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert a == b


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(64).write.mode("overwrite").parquet(frag)
    assert len(glob.glob(os.path.join(frag, "*.parquet"))) >= 64
    compact(spark, frag, out, target_files=4)
    assert len(glob.glob(os.path.join(out, "*.parquet"))) == 4
    assert spark.read.parquet(out).count() == li.count()


def test_upsert_parquet(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F
    from pyspark_mrdf_spark.io import upsert_parquet

    base_p = str(tmp_path / "base")
    out_p = str(tmp_path / "merged")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.parquet(base_p)
    updates = docs.filter(F.col("doc_id") < 10).withColumn(
        "text", F.lit("REPLACED")
    ).unionByName(
        docs.filter(F.col("doc_id") < 5).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
    )
    upsert_parquet(spark, base_p, updates, "doc_id", out_p)
    merged = spark.read.parquet(out_p)
    assert merged.count() == docs.count() + 5
    assert merged.filter(F.col("text") == "REPLACED").count() == 10
    assert merged.select("doc_id").distinct().count() == merged.count()


def test_dedup_against_corpus(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark_mrdf_spark.operators.dedup import dedup_against

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    # batch: 20 copies of corpus docs + 30 genuinely new + 2 in-batch dupes
    copies = docs.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 500_000
    )
    fresh = docs.filter(F.col("doc_id") >= 400).limit(30).withColumn(
        "doc_id", F.col("doc_id") + 600_000
    )
    batch_dupe = fresh.limit(2).withColumn("doc_id", F.col("doc_id") + 700_000)
    batch = copies.unionByName(fresh).unionByName(batch_dupe)
    out = dedup_against(batch, corpus)
    assert out.count() == 30  # copies dropped, in-batch dupes collapsed
    assert out.filter(F.col("doc_id") >= 700_000).count() == 0
