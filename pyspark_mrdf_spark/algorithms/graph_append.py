"""Incremental kNN-graph maintenance: fold an appended vector batch
into an existing graph instead of rebuilding the forest.

The production twin of the id-preserving fvecs append
(``sources/fvecs_datasource.py``) and the measured incremental-dedup
pattern (q142, 17× vs recompute): a serving corpus grows by a 1-5%
batch per ingest cycle, and rebuilding the whole MRDF forest
(``algorithms/mrdf.knn_graph``) for every cycle pays O(n) division +
leaf work for O(m) new information. The reference has no incremental
path at all (its pipeline — main.py — is build-once); this operator
completes the build → serve → APPEND lifecycle. Measured
(SCALABILITY.json synthetic-100000x64-graph-append): a 2% batch folds
into a 100k-node MRDF graph in 31.0 s vs a 310.8 s rebuild (10.0×) at
sampled recall 0.9886 vs the rebuild's 0.9999.

Two tiers, one contract — edge table (src, dst, dist_sq, rnk), ≤ k
edges per src over the UNION corpus:

 - **exact** — the batch's cross distances are computed exactly both
   ways (new→old and old→new are the same m×n work; ``knn_search``'s
   blocked kernel), plus the m×m in-batch graph, then merged with the
   old adjacency under a per-src top-k window. If the old graph is
   the exact kNN graph of the old corpus, the result IS the exact kNN
   graph of the union — bit-identically, not approximately (the law
   test replays ``knn_exact_blocked`` on the union and compares ids
   AND float64 distances): an old node's union top-k is the top-k of
   (its exact top-k among old) ∪ (its exact top-k among new), and both
   halves are present by construction. Cost O(m·n), vs the rebuild's
   O(n²).
 - **graph** — the scale path: new→old candidates come from BEAM
   SEARCH over the existing graph (``graph_knn_search`` — the serving
   operator reused for maintenance, component-safe entries included),
   so the old corpus is never scanned; old→new updates are the
   REVERSE of those walk results; in-batch edges are exact (m is
   small by the append contract); then ``refine_rounds``
   neighbor-of-neighbor rounds (NN-Descent's step, restricted to the
   AFFECTED set: new nodes + old nodes that gained a new edge) repair
   the asymmetric misses.

**Affected-only merging (the 100-TB shape).** Only srcs that can
change are ever shuffled: a kth-distance PREFILTER drops candidate
edges that are strictly worse than their src's current k-th edge
(they cannot enter the top-k under the (dist_sq, dst) order), the
top-k window runs on the surviving affected srcs' rows only, and
every other old row passes through VERBATIM — no shuffle, no window,
no rank recomputation. For that pass-through to be free the old graph
must carry its ranks; this operator's own output does, so append
cycles CHAIN: graph_n+1 = knn_graph_append(graph_n, ...) touches
O(batch) rows per cycle no matter how big the graph has grown. A
rank-less input (e.g. ``knn_graph`` output or a re-read adjacency
file) pays one O(n·k) ranking window on entry — once, not per cycle.
Refine rounds expand adjacency through the FULL graph (a broadcast
hash join: the batch-proportional candidate side broadcasts, the edge
table only scans) but merge only the active srcs.

``mode='auto'`` routes: exact when the batch-cross work m·n is small
(≤ ``EXACT_AUTO_MAX_CROSS`` pairs), graph otherwise.

Determinism: every step is seeded/tie-broken like the rest of the
engine (md5 entries, (dist_sq, dst) windows, fixed-order float64), so
both tiers are run-to-run and partitioning deterministic — the exact
tier is oracle-checkable end-to-end (q158: oracle = the rebuilt exact
graph in SQL, because equality-with-rebuild IS the contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_mrdf_spark.functions.vector import l2_sq

EXACT_AUTO_MAX_CROSS = 50_000_000  # m·n pairs; ~the blocked kernel's comfort zone


def knn_graph_append(
    old_graph: DataFrame,
    old_corpus: DataFrame,
    new_batch: DataFrame,
    k: int,
    mode: str = "auto",
    beam: int = 32,
    k_candidates: int | None = None,
    refine_rounds: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = False,
    return_delta: bool = False,
) -> DataFrame:
    """Fold ``new_batch`` into ``old_graph`` (built over ``old_corpus``)
    → (src, dst, dist_sq, rnk) over the union corpus, ≤ k per src,
    rnk ascending by (dist_sq, dst). Ids must be disjoint between
    ``old_corpus`` and ``new_batch`` (the fvecs append's id contract).

    ``old_graph`` needs (src, dst); with (dist_sq, rnk) also present —
    this operator's own output shape — unaffected rows pass through
    with zero shuffle (module docstring). If ``dist_sq`` is missing
    (a re-read adjacency file), distances are re-derived via the JVM
    ``l2_sq`` expression. CAVEAT: that expression's sequential fold
    can differ from the blocked exact kernel's accumulation in the
    LAST ULP (measured ~1e-15 relative at d=64), so the re-derived
    path preserves ids/ranks except on exact ulp-ties and the
    bit-identity law only holds for a ``dist_sq``-carrying graph —
    which every in-engine builder emits.

    ``materialize=True`` returns the result EAGERLY computed and
    stats-pinned (``cache.pin_stats``) — REQUIRED when the output
    feeds the next append cycle (the chained-maintenance deployment
    shape). Without it, each cycle's plan snapshot carries the
    previous cycle's multiplied sizeInBytes estimates and Catalyst's
    size-only stats visitor compounds them exponentially: the
    measured round-12 failure was a 25+ minute DRIVER stall inside
    BigInteger multiplication by cycle 3 (EXPLAIN.md), executors
    idle. Values are identical either way (law-tested); the default
    stays lazy for one-shot appends (q158's oracle flow).

    ``return_delta=True`` returns ONLY the rows of srcs this append
    may have changed (the affected old srcs' re-windowed adjacency +
    the new srcs'), i.e. a per-src REPLACEMENT delta: overlaying it
    on the old graph (delta rows win per src) reproduces the full
    output exactly (law-tested). This is the streaming-maintenance
    shape (``streaming/ingest.graph_append_stream``): each micro-batch
    persists an O(batch)-row delta partition instead of rewriting the
    O(n·k) edge table."""
    if k < 1:
        raise ValueError(f"knn_graph_append: need k >= 1, got {k}")
    if mode not in ("auto", "exact", "graph"):
        raise ValueError(f"knn_graph_append: unknown mode {mode!r}")
    from pyspark_mrdf_spark.operators.similarity import knn_search

    old_c = old_corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).localCheckpoint(eager=False)
    new_c = new_batch.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).localCheckpoint(eager=False)
    # the counts drive auto-routing and materialize the checkpoints;
    # graph mode still needs m to size the in-batch exact step.
    # r15 (verdict item 4, per-query driver latency): ONE tagged-union
    # aggregate instead of two sequential count() actions — the single
    # job still materializes BOTH checkpoints, and a chained caller
    # (q162 runs two appends, the streaming twin one per micro-batch)
    # saves a driver round-trip per append.
    counts = dict(
        old_c.select(F.lit(0).alias("_t"))
        .unionByName(new_c.select(F.lit(1).alias("_t")))
        .groupBy("_t")
        .count()
        .collect()
    )
    n_old, m_new = int(counts.get(0, 0)), int(counts.get(1, 0))
    if mode == "auto":
        mode = "exact" if n_old * m_new <= EXACT_AUTO_MAX_CROSS else "graph"

    union_c = old_c.unionByName(new_c)

    # old rows with ranks: reused when present (zero-shuffle chaining),
    # derived once otherwise (the documented one-time entry cost)
    if "dist_sq" in old_graph.columns:
        old_scored = old_graph.select("src", "dst", "dist_sq")
    else:
        sv = union_c.select(F.col("vid").alias("src"), F.col("vec").alias("_sv"))
        dv = union_c.select(F.col("vid").alias("dst"), F.col("vec").alias("_dv"))
        old_scored = (
            old_graph.select("src", "dst").join(sv, "src").join(dv, "dst")
            .select("src", "dst", l2_sq("_sv", "_dv").alias("dist_sq"))
        )
    if "dist_sq" in old_graph.columns and "rnk" in old_graph.columns:
        old_ranked = old_graph.select(
            "src", "dst", "dist_sq", F.col("rnk").cast("int").alias("rnk")
        ).filter(F.col("rnk") <= k)
    else:
        old_ranked = _topk(old_scored, k)
    old_ranked = old_ranked.localCheckpoint(eager=False)
    # per-src k-th (worst kept) distance — a narrow filter when ranks
    # are present, the prefilter's whole input. Srcs with fewer than k
    # edges have no rnk==k row, land NULL in the left join below, and
    # keep every candidate (they are unsaturated).
    kth = old_ranked.filter(F.col("rnk") == k).select(
        "src", F.col("dist_sq").alias("_kth")
    )

    def _as_corpus(c: DataFrame) -> DataFrame:
        return c.select(F.col("vid").alias(id_col), F.col("vec").alias(vec_col))

    # in-batch edges are exact in BOTH tiers: m is small by the append
    # contract, and the new points have no graph to walk yet
    new_new = (
        knn_search(
            _as_corpus(new_c), _as_corpus(new_c), min(k, max(m_new - 1, 1)),
            id_col=id_col, vec_col=vec_col, include_self=False,
            broadcast_max_rows=None,
        ).select("src", "dst", "dist_sq")
        if m_new > 1
        else old_ranked.select("src", "dst", "dist_sq").limit(0)
    )

    def _merge_affected(
        cand_old: DataFrame, new_side: DataFrame, reduce_kth: bool = False
    ) -> DataFrame:
        """Final union-graph assembly: candidates for old srcs are
        kth-prefiltered; only surviving srcs re-window; everything
        else passes through verbatim.

        ``reduce_kth`` (the GRAPH tier, where cand_old's srcs are
        batch-proportional): shrink the O(n)-row kth table to the
        candidate srcs with a broadcast semi-join BEFORE the left
        join, so the kth side is one column-pruned scan — never an
        O(n) shuffle. Without this, a stats-pinned chained input
        (materialize=True leaves read as LARGE) demoted the join to
        an O(n)-shuffle sort-merge every cycle — measured 2× the
        whole cycle wall at n=100k (25.0 → 51.4 s between cycles 1
        and 2). The EXACT tier keeps the plain join: there cand_old
        spans every old src (O(n) ids — nothing to reduce, and the
        id-list broadcast would itself be corpus-sized)."""
        if reduce_kth:
            kth_side = F.broadcast(
                kth.join(
                    F.broadcast(cand_old.select("src").distinct()),
                    "src",
                    "left_semi",
                )
            )
        else:
            kth_side = kth
        survivors = (
            cand_old.join(kth_side, "src", "left")
            .filter(F.col("_kth").isNull() | (F.col("dist_sq") <= F.col("_kth")))
            .select("src", "dst", "dist_sq")
            .localCheckpoint(eager=False)
        )
        affected = survivors.select("src").distinct()
        merged_aff = _topk(
            old_ranked.select("src", "dst", "dist_sq")
            .join(F.broadcast(affected), "src", "left_semi")
            .unionByName(survivors),
            k,
        )
        untouched = old_ranked.join(F.broadcast(affected), "src", "left_anti")
        return untouched, merged_aff.unionByName(_topk(new_side, k))

    def _finish(result: DataFrame) -> DataFrame:
        if materialize:
            from pyspark_mrdf_spark.cache import pin_stats

            return pin_stats(result)
        return result

    if mode == "exact":
        # new→old keeps knn_search's tier routing: the old corpus can
        # be large here (auto admits m·n up to 50M pairs), and the
        # blocked tier avoids broadcasting it whole
        new_old = knn_search(
            _as_corpus(new_c), _as_corpus(old_c), min(k, n_old),
            id_col=id_col, vec_col=vec_col, include_self=False,
        ).select("src", "dst", "dist_sq")
        old_new = knn_search(
            _as_corpus(old_c), _as_corpus(new_c), min(k, m_new),
            id_col=id_col, vec_col=vec_col, include_self=False,
            broadcast_max_rows=None,
        ).select("src", "dst", "dist_sq")
        untouched, changed = _merge_affected(
            old_new, new_old.unionByName(new_new)
        )
        return _finish(
            changed if return_delta else untouched.unionByName(changed)
        )

    # ---- graph tier --------------------------------------------------
    from pyspark_mrdf_spark.operators.graph_search import graph_knn_search

    if k_candidates is None:
        k_candidates = min(max(2 * k, 16), beam)
    if k_candidates > beam:
        raise ValueError(
            f"knn_graph_append: k_candidates {k_candidates} > beam {beam}"
        )
    walked = graph_knn_search(
        _as_corpus(new_c), old_graph.select("src", "dst"), _as_corpus(old_c),
        k_candidates, beam=beam, id_col=id_col, vec_col=vec_col,
    ).select("src", "dst", "dist_sq").localCheckpoint(eager=False)
    # reverse the walk results for the old side: an old node's best new
    # neighbors are (mostly) the new nodes that found IT — the
    # asymmetric misses are what refine_rounds repairs
    reverse = walked.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "dist_sq"
    )
    g_untouched, g_changed = _merge_affected(
        reverse, walked.unionByName(new_new), reduce_kth=True
    )
    g_full = g_untouched.unionByName(g_changed)
    # split active (srcs that saw any candidate this cycle — batch-
    # proportional) from the untouched remainder: refine re-windows
    # active rows only
    touched = (
        reverse.select("src")
        .unionByName(new_c.select(F.col("vid").alias("src")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    g_active = g_full.join(F.broadcast(touched), "src", "left_semi").localCheckpoint(
        eager=False
    )
    g_rest = old_ranked.join(F.broadcast(touched), "src", "left_anti")

    if refine_rounds > 0:
        new_ids = new_c.select(F.col("vid").alias("src"))
        for _ in range(refine_rounds):
            # affected = new nodes + old nodes adjacent to a new node:
            # batch-proportional by construction (≤ m + m·k rows).
            # Only active srcs can hold a new-node dst, so the scan
            # stays off the full graph.
            affected = (
                g_active.join(
                    new_ids.select(F.col("src").alias("dst")), "dst", "left_semi"
                )
                .select("src")
                .unionByName(new_ids)
                .distinct()
            )
            # one NN-Descent step restricted to the affected set:
            # candidates = neighbors of neighbors, scored exactly. The
            # hop table (affected × k) broadcasts; the full edge table
            # (adjacency for ANY mid, active or not) only scans.
            hops = (
                g_active.join(F.broadcast(affected), "src")
                .select("src", F.col("dst").alias("mid"))
            )
            cand = (
                g_rest.select("src", "dst", "dist_sq")
                .unionByName(g_active.select("src", "dst", "dist_sq"))
                .select(F.col("src").alias("mid"), F.col("dst").alias("cnd"))
                .join(F.broadcast(hops), "mid")
                .select("src", F.col("cnd").alias("dst"))
                .filter(F.col("src") != F.col("dst"))
                .distinct()
                .join(g_active.select("src", "dst"), ["src", "dst"], "left_anti")
                .localCheckpoint(eager=False)
            )
            # vector resolution without a corpus shuffle: broadcast the
            # batch-proportional ID lists into semi-join scans of the
            # corpus, then equi-join the batch-sized results
            sv_part = union_c.select(
                F.col("vid").alias("src"), F.col("vec").alias("_sv")
            ).join(F.broadcast(cand.select("src").distinct()), "src", "left_semi")
            dv_part = union_c.select(
                F.col("vid").alias("dst"), F.col("vec").alias("_dv")
            ).join(F.broadcast(cand.select("dst").distinct()), "dst", "left_semi")
            scored = (
                cand.join(sv_part, "src")
                .join(dv_part, "dst")
                .select("src", "dst", l2_sq("_sv", "_dv").alias("dist_sq"))
            )
            g_active = _topk(
                g_active.select("src", "dst", "dist_sq").unionByName(scored), k
            ).localCheckpoint(eager=False)
    # g_active covers exactly the srcs this append touched (reverse
    # srcs + new ids) — the graph tier's replacement delta
    return _finish(g_active if return_delta else g_rest.unionByName(g_active))


def _topk(edges: DataFrame, k: int) -> DataFrame:
    # dedup by MIN distance per (src, dst): candidate branches compute
    # distances with the same fixed-order arithmetic, so duplicates tie
    # — min just makes the pick deterministic rather than
    # partition-dependent
    w = Window.partitionBy("src").orderBy("dist_sq", "dst")
    return (
        edges.groupBy("src", "dst")
        .agg(F.min("dist_sq").alias("dist_sq"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
