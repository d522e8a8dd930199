"""knn_search (external query set) and hyperplane LSH buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_mrdf_spark.io import load_table
from pyspark_mrdf_spark.operators.similarity import (
    knn_exact,
    knn_search,
    lsh_hyperplane_buckets,
)


def test_knn_search_subset_matches_self_graph(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 50)
    sub = knn_search(queries, emb, 5, include_self=False).collect()
    full = knn_exact(emb, 5).filter(F.col("src") < 50).collect()
    key = lambda r: (r["src"], r["rnk"])
    assert sorted((r["src"], r["rnk"], r["dst"]) for r in sub) == sorted(
        (r["src"], r["rnk"], r["dst"]) for r in full
    )


def test_knn_search_includes_self_by_default(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    one = knn_search(emb.filter(F.col("vec_id") == 3), emb, 1).collect()
    assert len(one) == 1 and one[0]["dst"] == 3 and one[0]["dist_sq"] == 0.0


def test_lsh_buckets_cover_all_vectors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    bk = lsh_hyperplane_buckets(emb, n_planes=4)
    rows = bk.collect()
    assert len(rows) == emb.count()
    assert all(0 <= r["bucket"] < 16 for r in rows)
