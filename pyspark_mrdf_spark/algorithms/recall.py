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
    (reference getrecall.py:30-35: matching edges / (k·n))."""
    exact = g_exact.select("src", "dst").distinct()
    approx = g_approx.select("src", "dst").distinct()
    total = exact.count()
    if total == 0:
        return 1.0
    hits = exact.join(approx, ["src", "dst"], "left_semi").count()
    return hits / total


def recall_vs_groundtruth(g: DataFrame, gt: DataFrame, k: int) -> float:
    """Recall against a ground-truth table (id, true_neighbors array) —
    finishes what reference getrecallivecs.py:40-42 left commented out."""
    edges = gt.select(
        F.col("id").alias("src"), F.explode(F.slice("true_neighbors", 1, k)).alias("dst")
    )
    return recall(edges, g)
