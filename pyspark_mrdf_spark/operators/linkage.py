"""Fuzzy record linkage: blocked candidate generation + edit-distance
scoring + per-record best match.

Entity resolution across corpus snapshots / vendor feeds is the string
cousin of embedding near-dup (operators/dedup.py): an all-pairs
levenshtein is O(n²·len²) and unshippable, so candidates come from
BLOCKING — equi-joins on cheap derived keys — and the expensive
distance runs on candidates only (the same candidates-then-verify
discipline every dedup tier here follows).

Two blocking passes per the classic multi-pass design: a name whose
corruption is a single edit keeps its first ``prefix_len`` characters
intact unless the edit hit the prefix, in which case it keeps its last
``prefix_len`` — so prefix-block ∪ suffix-block covers every
single-edit corruption of names longer than 2·prefix_len (shorter
names can slip both blocks; callers with tiny strings should lower
``prefix_len``). Blocking recall is a parameter choice, not silent
loss: the SQL oracle replays the identical blocks, and the docstring
states the coverage bound.

``F.levenshtein`` is the JVM built-in (classic unweighted edit
distance, identical semantics to DuckDB's ``levenshtein`` — pinned by
test); the per-record argmin is a (distance, name) window with rank 1,
deterministic under ties.

Scale shape: two equi-joins on short block keys (hot blocks are a
data-quality smell — the ``max_block`` stoplist below is the standard
guard and composes exactly like dedup.py's ``max_df`` shingle
stoplist), one window partitioned by dirty-record id (millions of
small partitions — no skew), zero cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def blocked_levenshtein_link(
    dirty: DataFrame,
    clean: DataFrame,
    id_col: str = "rec_id",
    name_col: str = "name",
    clean_name_col: str = "name",
    max_dist: int = 1,
    prefix_len: int = 3,
    max_block: int | None = None,
) -> DataFrame:
    """Best clean-side match per dirty record →
    (id_col, name_col, matched_name, dist); records with no candidate
    within ``max_dist`` are absent (filter-left-join to keep them).

    ``clean`` is deduplicated on ``clean_name_col`` — linkage is to a
    NAME, not a row; resolve name→rows downstream if needed.

    ``max_block`` (the hot-block stoplist): candidate-pair mass is
    Σ_blocks |dirty_block|·|clean_block|, so one non-discriminative
    key (a shared 3-char prefix across a large name family) grows the
    plan QUADRATICALLY in that family's size — the measured 30×
    relational replication shape, where every replica of a name
    shares its prefix block. With ``max_block`` set, block keys whose
    CLEAN-side distinct-name frequency exceeds it are dropped from
    BOTH passes (the join is on the key, so filtering the clean side
    filters the pair). The recall cost is honest and data-dependent:
    a dirty record whose every key is hot gets no candidates — the
    30× evidence row (`scripts/scalability.py --relational-only
    --relational-factor 30`) records wall AND match-agreement for
    capped vs uncapped on the same corpus."""
    d = dirty.select(F.col(id_col), F.col(name_col).alias("_dn"))
    c = clean.select(F.col(clean_name_col).alias("_cn")).distinct()

    def keyed(df: DataFrame, col: str, out: str) -> DataFrame:
        pre = F.substring(F.col(col), 1, prefix_len)
        # suffix via explicit positive arithmetic: negative-start
        # substring semantics differ across engines; this form is
        # identical in Spark and ANSI SQL (and the oracle mirrors it)
        suf = F.expr(
            f"substring({col}, greatest(length({col}) - {prefix_len} + 1, 1),"
            f" {prefix_len})"
        )
        return df.withColumn(out, F.array(pre, suf))

    dk = keyed(d, "_dn", "_bk").select(id_col, "_dn", F.explode("_bk").alias("_k"))
    ck = (
        keyed(c, "_cn", "_bk")
        .select("_cn", F.explode("_bk").alias("_k"))
        .distinct()
    )
    if max_block is not None:
        hot = (
            ck.groupBy("_k")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_block)
            .select("_k")
        )
        ck = ck.join(F.broadcast(hot), "_k", "left_anti")
    cand = (
        dk.join(ck, "_k")
        .select(id_col, "_dn", "_cn")
        .distinct()
        .withColumn("dist", F.levenshtein("_dn", "_cn"))
        .filter(F.col("dist") <= max_dist)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("dist"), F.col("_cn"))
    return (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            F.col(id_col),
            F.col("_dn").alias(name_col),
            F.col("_cn").alias("matched_name"),
            "dist",
        )
    )
