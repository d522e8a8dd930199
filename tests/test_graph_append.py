"""Incremental kNN-graph maintenance (knn_graph_append): the exact
tier's equality-with-rebuild law, the graph tier's recall bar vs a
full rebuild, determinism, and dial validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_mrdf_spark.algorithms.graph_append import knn_graph_append
from pyspark_mrdf_spark.io import load_table
from pyspark_mrdf_spark.operators.similarity import knn_exact_blocked


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def split(spark, emb):
    old = emb.filter(F.col("vec_id") % 20 != 0).localCheckpoint(eager=True)
    new = emb.filter(F.col("vec_id") % 20 == 0).localCheckpoint(eager=True)
    return old, new


def _rows(df):
    return sorted(
        (r["src"], r["rnk"], r["dst"], r["dist_sq"]) for r in df.collect()
    )


def test_exact_tier_equals_rebuild_bit_identically(spark, emb, split):
    """The exact tier's contract: folding the batch into the exact old
    graph yields EXACTLY the exact graph of the union — ids, ranks,
    and float64 distances (this is what makes q158's oracle a plain
    rebuilt-graph CTE rather than a replay of the merge mechanics)."""
    old, new = split
    k = 5
    old_graph = knn_exact_blocked(old, k).localCheckpoint(eager=True)
    inc = knn_graph_append(old_graph, old, new, k, mode="exact")
    rebuilt = knn_exact_blocked(emb, k)
    assert _rows(inc) == _rows(rebuilt)


def test_exact_tier_rederives_missing_distances(spark, emb, split):
    # an adjacency re-read from disk has no dist_sq column; the merge
    # re-derives distances via the JVM l2_sq expression, whose fold
    # can differ from the blocked kernel's in the LAST ULP (docstring
    # caveat) — so ids/ranks must match exactly and distances to 1e-9
    old, new = split
    k = 4
    old_graph = knn_exact_blocked(old, k).select("src", "dst")
    inc = knn_graph_append(old_graph, old, new, k, mode="exact")
    got = {(r["src"], r["rnk"]): (r["dst"], r["dist_sq"]) for r in inc.collect()}
    want = {
        (r["src"], r["rnk"]): (r["dst"], r["dist_sq"])
        for r in knn_exact_blocked(emb, k).collect()
    }
    assert set(got) == set(want)
    for key, (dst, d2) in want.items():
        gdst, gd2 = got[key]
        assert gdst == dst, key
        assert abs(gd2 - d2) <= 1e-9 * max(1.0, abs(d2)), key


def test_exact_tier_chains_across_cycles(spark, emb):
    """Append cycles CHAIN on the operator's own rank-carrying output
    (the zero-shuffle pass-through path): two successive exact appends
    equal one rebuild of the final union, bit-identically."""
    old = emb.filter(F.col("vec_id") % 10 >= 2).localCheckpoint(eager=True)
    b1 = emb.filter(F.col("vec_id") % 10 == 0).localCheckpoint(eager=True)
    b2 = emb.filter(F.col("vec_id") % 10 == 1).localCheckpoint(eager=True)
    k = 5
    g0 = knn_exact_blocked(old, k)
    g1 = knn_graph_append(g0, old, b1, k, mode="exact").localCheckpoint(eager=True)
    g2 = knn_graph_append(g1, old.unionByName(b1), b2, k, mode="exact")
    assert _rows(g2) == _rows(knn_exact_blocked(emb, k))


def test_graph_tier_recall_vs_rebuild(spark, emb, split):
    """The scale path: beam-search candidates + reverse edges + one
    restricted refine round must land within 5% of the full rebuild's
    recall (here the rebuild is exact, recall 1.0, so the bar is an
    absolute 0.95)."""
    from pyspark_mrdf_spark.algorithms.recall import recall

    old, new = split
    k = 5
    old_graph = knn_exact_blocked(old, k).localCheckpoint(eager=True)
    inc = knn_graph_append(old_graph, old, new, k, mode="graph")
    exact = knn_exact_blocked(emb, k)
    r = recall(exact, inc)
    assert r >= 0.95, f"graph-tier append recall {r} below 0.95 of rebuild"
    # shape contract: <= k edges per src, every union id present
    per_src = inc.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert per_src <= k
    assert inc.select("src").distinct().count() == emb.count()


def test_graph_tier_deterministic_across_partitioning(spark, emb, split):
    old, new = split
    k = 3
    old_graph = knn_exact_blocked(old, k).localCheckpoint(eager=True)
    a = knn_graph_append(old_graph, old, new, k, mode="graph", refine_rounds=1)
    b = knn_graph_append(
        old_graph.repartition(7), old.repartition(5), new.repartition(3),
        k, mode="graph", refine_rounds=1,
    )
    assert _rows(a) == _rows(b)


def test_auto_routes_exact_small(spark, emb, split):
    old, new = split
    # at sf-test scale m*n is far below the auto threshold -> exact
    inc = knn_graph_append(knn_exact_blocked(old, 3), old, new, 3, mode="auto")
    assert _rows(inc) == _rows(knn_exact_blocked(emb, 3))


def test_validation(spark, emb, split):
    old, new = split
    g = knn_exact_blocked(old, 3)
    with pytest.raises(ValueError, match="mode"):
        knn_graph_append(g, old, new, 3, mode="nope")
    with pytest.raises(ValueError, match="k >= 1"):
        knn_graph_append(g, old, new, 0)
    with pytest.raises(ValueError, match="k_candidates"):
        knn_graph_append(g, old, new, 3, mode="graph", beam=8, k_candidates=16)


def test_materialize_chains_bit_identically_with_bounded_stats(spark, emb):
    """materialize=True (the chained-deployment dial) must change
    NOTHING about values — the chaining law holds bit-identically —
    while keeping each cycle's planner estimate at the bounded leaf
    default (the round-12 wedge was Catalyst multiplying compounded
    snapshot stats into Toom-Cook-3-sized BigIntegers by cycle 3)."""
    old = emb.filter(F.col("vec_id") % 10 >= 3).localCheckpoint(eager=True)
    k = 4
    g = knn_exact_blocked(old, k).localCheckpoint(eager=True)
    corpus = old
    for m in range(3):
        batch = emb.filter(F.col("vec_id") % 10 == m).localCheckpoint(eager=True)
        g = knn_graph_append(g, corpus, batch, k, mode="exact", materialize=True)
        corpus = corpus.unionByName(batch)
        digits = len(
            str(g._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        assert digits <= 19, f"cycle {m}: stats estimate {digits} digits"
    assert _rows(g) == _rows(
        knn_exact_blocked(emb.filter(F.col("vec_id") % 10 <= 9), k)
    )


def test_materialize_graph_tier_values_identical(spark, emb, split):
    old, new = split
    k = 3
    old_graph = knn_exact_blocked(old, k).localCheckpoint(eager=True)
    lazy = knn_graph_append(old_graph, old, new, k, mode="graph")
    mat = knn_graph_append(old_graph, old, new, k, mode="graph", materialize=True)
    assert _rows(lazy) == _rows(mat)
