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
