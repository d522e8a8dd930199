"""Skew mitigation primitives (SURVEY.md §4.1 "skew handling").

MRDF's α-division bounds vector groups algorithmically and AQE's
skew-join splitting is on by default (session.py), but a pipeline at
100 TB still meets hot keys in plain equi-joins (one user with 10⁸
events, one document duplicated everywhere). ``salted_join`` is the
classic fix: spray the skewed side across ``n_salts`` sub-keys and
replicate the small side to match — the hot key's rows land on
n_salts reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SALTED_JOIN_HOWS = frozenset(
    {
        "inner",
        "left",
        "left_outer",
        "leftouter",
        "left_semi",
        "leftsemi",
        "semi",  # Spark alias for left_semi
        "left_anti",
        "leftanti",
        "anti",  # Spark alias for left_anti
    }
)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``key`` with the skewed side
    salted into ``n_salts`` shuffle sub-keys.

    ``other`` is replicated n_salts× (explode of a literal range — no
    extra scan), so it should be the smaller side; for the supported
    join types the result equals the plain join exactly, row
    multiplicity included.

    Supported ``how``: inner / left / left_semi / left_anti — the
    types whose output is driven by the (unreplicated) skewed side.
    right/full are rejected: an ``other`` row with no match would
    surface once per salt (n_salts copies), silently corrupting
    multiplicity. Salt the other side instead (swap the arguments), or
    de-dup unmatched rows downstream."""
    how_norm = how.replace("_", "").lower()
    if how_norm not in {h.replace("_", "") for h in SALTED_JOIN_HOWS}:
        raise ValueError(
            f"salted_join supports {sorted(SALTED_JOIN_HOWS)}; got how={how!r} "
            "(right/full would emit each unmatched replicated row n_salts times)"
        )
    salt = (F.rand(seed) * n_salts).cast("int")
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = left.join(right, [key, "_salt"], how)
    # semi/anti joins never take right-side columns, so _salt is already gone
    return joined.drop("_salt") if "_salt" in joined.columns else joined


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Join-key skew diagnosis → one row per log2 frequency bucket:
    (log2_bucket, n_keys, n_rows, max_key_rows). The "why is this join
    slow" report: a healthy key column concentrates in low buckets; a
    bucket-20 key means one task will receive 1M+ rows of that key
    after the shuffle, and the caller should reach for ``salted_join``
    / AQE skew handling / a broadcast of the other side.

    Two exact integer aggregates: per-key counts (the same shuffle the
    join itself would do — running the profile costs one pass of what
    it diagnoses), then a count-of-counts rollup by floor(log2(n)).
    NULL keys get their own bucket (-1): they hash together too, and a
    null-heavy key column is the most common skew bug of all."""
    per_key = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    bucket = F.when(F.col(key_col).isNull(), F.lit(-1)).otherwise(
        F.floor(F.log2("n")).cast("long")
    )
    return (
        per_key.select(bucket.alias("log2_bucket"), "n")
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("n").cast("long").alias("n_rows"),
            F.max("n").cast("long").alias("max_key_rows"),
        )
    )
