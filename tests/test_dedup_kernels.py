"""r14 optimization-round laws: the Python shingle/minhash kernels
must be BIT-IDENTICAL to the JVM expression chain they replaced
(``functions.text.shingles`` + md5 aggregation) — the optimization
changed operator internals, so the equivalence is pinned here
explicitly (the DuckDB oracle gate pins it end-to-end through every
consumer query).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_mrdf_spark.functions.text import shingles
from pyspark_mrdf_spark.operators.dedup import (
    _py_shingles,
    lsh_band_buckets,
    minhash_signatures,
    shingle_table,
)

# edge cases: multi-space runs (split(" ") keeps empties), leading/
# trailing spaces, exactly-n tokens, short texts, unicode, repeated
# shingles (distinct keeps first occurrence), empty string
EDGE_TEXTS = [
    "a b c d e",
    "a  b   c d",
    " leading space",
    "trailing space ",
    "one two three",
    "one two",
    "x",
    "",
    "déjà vu naïve déjà vu naïve déjà vu",
    "a b a b a b a b",
    "tab\there is one token",
]


def _edge_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id long, text string"
    )


def test_py_shingles_matches_jvm_expression(spark):
    df = _edge_df(spark)
    jvm = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", shingles("text", 3).alias("g")).collect()
    }
    for i, t in enumerate(EDGE_TEXTS):
        assert _py_shingles(t, 3) == jvm[i], f"text={t!r}"


def test_py_shingles_none_text():
    assert _py_shingles(None, 3) == []


def test_shingle_table_kernel_matches_jvm(spark):
    df = _edge_df(spark)
    kernel = {
        (r["doc_id"], r["shingle"]) for r in shingle_table(df, 3).collect()
    }
    jvm = {
        (r["doc_id"], r["shingle"])
        for r in df.select(
            "doc_id", F.explode(shingles("text", 3)).alias("shingle")
        ).collect()
    }
    assert kernel == jvm


def test_minhash_kernel_matches_jvm_aggregation(spark):
    """The kernel's per-doc minima == the former explode + groupBy
    min(md5(i || ':' || shingle)) plan, including the drop-empty-doc
    semantics."""
    df = _edge_df(spark)
    post = df.select("doc_id", F.explode(shingles("text", 3)).alias("shingle"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(8)
    ]
    jvm = {
        r["doc_id"]: [r[f"h{i}"] for i in range(8)]
        for r in post.groupBy("doc_id").agg(*aggs).collect()
    }
    kernel = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signatures(df, 8, 3).collect()
    }
    assert kernel == jvm  # same docs (empty-shingle docs absent), same hex


def test_lsh_band_buckets_explode_matches_union_form(spark):
    """The single-explode bucket build == the former bands-way union."""
    sig = minhash_signatures(_edge_df(spark), 8, 3)
    got = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in lsh_band_buckets(sig, 4, 2).collect()
    }
    want = set()
    for band in range(4):
        rows = sig.select(
            "doc_id",
            F.md5(
                F.concat_ws("|", F.slice(F.col("signature"), band * 2 + 1, 2))
            ).alias("bucket"),
        ).collect()
        want |= {(r["doc_id"], band, r["bucket"]) for r in rows}
    assert got == want


@pytest.mark.parametrize("n", [1, 2, 5])
def test_py_shingles_other_n(spark, n):
    df = _edge_df(spark)
    jvm = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", shingles("text", n).alias("g")).collect()
    }
    for i, t in enumerate(EDGE_TEXTS):
        assert _py_shingles(t, n) == jvm[i], f"n={n} text={t!r}"
