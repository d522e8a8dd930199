"""Recall evaluation: fraction of true k-NN edges recovered.

Re-expresses reference getrecall.py:1-35 (join + per-row intersection
count + global sum) and the unfinished ivecs ground-truth path
(getrecallivecs.py:1-42) on edge tables: one equi-join, one aggregate,
one scalar action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall(g_exact: DataFrame, g_approx: DataFrame) -> float:
    """recall = |exact ∩ approx| / |exact| over (src, dst) edge sets
    (reference getrecall.py:30-35: matching edges / (k·n)).

    Total and hits come from ONE aggregate over a left join — a single
    Spark action, so each input graph is evaluated exactly once (the
    two-action variant recomputed the expensive exact side for its
    separate ``count()``)."""
    exact = g_exact.select("src", "dst").distinct()
    approx = (
        g_approx.select("src", "dst").distinct().withColumn("_hit", F.lit(1))
    )
    row = (
        exact.join(approx, ["src", "dst"], "left")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0)).alias("hits"),
        )
        .collect()[0]
    )
    if not row["total"]:
        return 1.0
    return (row["hits"] or 0) / row["total"]


def recall_vs_groundtruth(g: DataFrame, gt: DataFrame, k: int) -> float:
    """Recall against a ground-truth table (id, true_neighbors array) —
    finishes what reference getrecallivecs.py:40-42 left commented out."""
    edges = gt.select(
        F.col("id").alias("src"), F.explode(F.slice("true_neighbors", 1, k)).alias("dst")
    )
    return recall(edges, g)
