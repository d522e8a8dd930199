"""Graph-based ANN serving: batched beam search over a prebuilt kNN
graph — the serving half of the graph-index architecture whose build
half is the engine's flagship (``algorithms/mrdf.knn_graph``; the
reference builds the graph — main.py / mrdf.py — but nothing in it
serves queries from the graph afterwards).

DiskANN/HNSW-family deployments answer queries by walking a proximity
graph: start at entry points, repeatedly expand the best unexpanded
candidates' adjacency lists, keep the best ``beam`` per query, stop
when the beam is fully expanded. Re-expressed Spark-first for a QUERY
BATCH rather than one query at a time:

 - every query advances one hop per ROUND, so the number of corpus
   passes is the graph's effective diameter (~5-10 rounds), not
   O(n_queries) — the round's adjacency resolution and vector
   resolution are each ONE equi-join whose small side (the combined
   frontier of all queries, ≤ n_queries·beam rows) broadcasts, so the
   graph and corpus never shuffle;
 - per-query state is (candidate id, d², expanded) — the beam window
   is partitioned by query id, never global;
 - the driver sees one scalar per round (the frontier count, which
   also materializes that round's lazy ``localCheckpoint``) — the
   MRDF/pagerank iteration discipline.

At 100 TB the batch shape is the point: a single query wants point
reads (what a serving node does); a Spark batch of 10k queries
amortizes each round's index scan across all of them, and with the
graph and corpus stored bucketed by id the broadcast-hash joins prune
to the touched buckets. Determinism: all windows tie-break by id and
the arithmetic is fixed-order JVM float64, so results are invariant
to partitioning (tested); entry points are md5-seeded (engine-portable
like every other sampling step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_mrdf_spark.functions.vector import l2_sq


def graph_knn_search(
    queries: DataFrame,
    graph: DataFrame,
    corpus: DataFrame,
    k: int,
    beam: int = 32,
    n_entry: int | None = None,
    max_rounds: int = 12,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = True,
) -> DataFrame:
    """Top-k of ``queries`` against ``corpus`` by beam search over
    ``graph`` ((src, dst) adjacency, e.g. a ``knn_graph`` output):
    (src, dst, dist_sq, rnk), rnk 1..k ascending by (dist_sq, dst) —
    the same contract as ``knn_search``, served from the graph index
    instead of a corpus scan. Recall is bought with ``beam`` (and the
    graph's quality); candidates are only ever graph neighbors of
    visited nodes, so a too-small ``beam`` caps recall — measured
    dials in tests/test_graph_search.py.

    CONNECTIVITY is the flat-graph failure mode: a kNN graph of a
    clustered corpus is a pile of per-cluster components (measured:
    the 250-cluster d=512 mixture gives recall 0.0 from 4 entry
    points — no walk crosses clusters). Graph-index deployments fix
    this with long-range edges (DiskANN RobustPrune), a hierarchy
    (HNSW), or ENTRY SEEDING; this operator takes the seeding route:
    ``n_entry=None`` (default) auto-sizes to max(4, ⌈√n_corpus⌉)
    md5-seeded entries — the same O(√n) rule as ``auto_n_centroids``
    — which covers every Θ(√n)-sized component w.h.p. (one count job,
    matching ``knn_search``'s tier-routing count; the planted-cluster
    law in tests/test_graph_search.py pins both the failure and the
    fix)."""
    if k < 1 or beam < k:
        raise ValueError(f"graph_knn_search: need beam >= k >= 1, got k={k}, beam={beam}")
    if n_entry is None:
        import math

        n_entry = max(4, math.isqrt(max(corpus.count() - 1, 0)) + 1)
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("_qvec")
    ).localCheckpoint(eager=False)
    c_vec = corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("_cvec"))
    adj = graph.select(F.col("src").alias("vid"), F.col("dst").alias("_nbr"))

    def _score(cand: DataFrame) -> DataFrame:
        """(qid, vid) -> (qid, vid, d2): one equi-join per side, the
        candidate side broadcast so graph/corpus never shuffle."""
        scored = (
            c_vec.join(F.broadcast(cand), "vid")
            .join(F.broadcast(q), "qid")
            .select("qid", "vid", l2_sq("_cvec", "_qvec").alias("d2"))
        )
        if not include_self:
            scored = scored.filter(F.col("vid") != F.col("qid"))
        return scored

    entry = (
        corpus.select(F.col(id_col).alias("vid"))
        .orderBy(F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))))
        .limit(n_entry)
    )
    state = (
        _score(q.select("qid").crossJoin(F.broadcast(entry)))
        .withColumn("expanded", F.lit(False))
        .localCheckpoint(eager=False)
    )

    w_beam = Window.partitionBy("qid").orderBy("d2", "vid")
    for _ in range(max_rounds):
        ranked = state.withColumn("_rnk", F.row_number().over(w_beam))
        frontier = (
            ranked.filter((F.col("_rnk") <= beam) & ~F.col("expanded"))
            .select("qid", "vid")
            .localCheckpoint(eager=False)
        )
        # the round's ONE action: materializes the frontier checkpoint
        # and decides convergence (beam fully expanded -> done)
        if frontier.count() == 0:
            break
        nbrs = (
            adj.join(F.broadcast(frontier), "vid")
            .select("qid", F.col("_nbr").alias("vid"))
            .distinct()
        )
        fresh = nbrs.join(state.select("qid", "vid"), ["qid", "vid"], "left_anti")
        state = (
            state.join(
                F.broadcast(frontier.withColumn("_f", F.lit(True))),
                ["qid", "vid"],
                "left",
            )
            .select(
                "qid",
                "vid",
                "d2",
                (F.col("expanded") | F.coalesce(F.col("_f"), F.lit(False))).alias(
                    "expanded"
                ),
            )
            .unionByName(_score(fresh).withColumn("expanded", F.lit(False)))
            .localCheckpoint(eager=False)
        )

    return (
        state.withColumn("rnk", F.row_number().over(w_beam))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").alias("src"),
            F.col("vid").alias("dst"),
            F.col("d2").alias("dist_sq"),
            "rnk",
        )
    )
