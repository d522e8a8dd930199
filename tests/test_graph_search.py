"""Graph-based ANN serving (beam search over a kNN graph): recall vs
exact search, partitioning invariance, beam-dial monotonicity, and the
disconnected-graph cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_mrdf_spark.io import load_table
from pyspark_mrdf_spark.operators.graph_search import graph_knn_search
from pyspark_mrdf_spark.operators.similarity import knn_exact_blocked, knn_search


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def graph(spark, emb):
    # the build half: a degree-10 exact kNN graph (what knn_graph/MRDF
    # approximates at scale)
    return (
        knn_exact_blocked(emb, 10).select("src", "dst").localCheckpoint(eager=True)
    )


def _recall(got, want):
    g = {}
    for r in got:
        g.setdefault(r["src"], set()).add(r["dst"])
    w = {}
    for r in want:
        w.setdefault(r["src"], set()).add(r["dst"])
    hits = sum(len(g.get(s, set()) & ds) for s, ds in w.items())
    return hits / sum(len(ds) for ds in w.values())


def test_graph_search_recall_vs_exact(spark, emb, graph):
    queries = emb.filter(F.col("vec_id") < 20)
    got = graph_knn_search(queries, graph, emb, k=5, beam=32).collect()
    want = knn_search(queries, emb, 5).collect()
    assert len({r["src"] for r in got}) == 20
    for r in got:
        assert 1 <= r["rnk"] <= 5
    r = _recall(got, want)
    assert r >= 0.9, f"graph-serving recall {r} below bar"


def test_graph_search_partitioning_invariant(spark, emb, graph):
    # force the distributed tier: at this corpus size auto routes
    # local, which is trivially layout-invariant and would test nothing
    queries = emb.filter(F.col("vec_id") < 8)
    a = graph_knn_search(
        queries, graph, emb, k=5, beam=16, route="distributed"
    ).collect()
    b = graph_knn_search(
        queries.repartition(7), graph.repartition(13), emb.repartition(5),
        k=5, beam=16, route="distributed",
    ).collect()
    key = lambda r: (r["src"], r["rnk"])
    assert sorted(((r["src"], r["rnk"], r["dst"]) for r in a)) == sorted(
        ((r["src"], r["rnk"], r["dst"]) for r in b)
    )


def test_graph_search_beam_dial(spark, emb, graph):
    """Recall is non-decreasing in beam on this corpus (the dial the
    docstring sells)."""
    queries = emb.filter(F.col("vec_id") < 12)
    want = knn_search(queries, emb, 5).collect()
    r_small = _recall(graph_knn_search(queries, graph, emb, 5, beam=5).collect(), want)
    r_big = _recall(graph_knn_search(queries, graph, emb, 5, beam=48).collect(), want)
    assert r_big >= r_small
    assert r_big >= 0.9


def test_graph_search_rejects_bad_beam(spark, emb, graph):
    with pytest.raises(ValueError, match="beam >= k"):
        graph_knn_search(emb.limit(1), graph, emb, k=5, beam=3)


def test_graph_search_entry_seeding_bridges_components(spark):
    """The flat-graph connectivity law: a kNN graph of two far-apart
    clusters is two components; ONE entry point strands every query
    whose cluster the entry missed (recall ~0.5 across a query set
    drawn from both), while the auto O(sqrt n) seeding reaches both.
    Pins both the failure mode and the fix the docstring claims."""
    import numpy as np

    n_half, d = 100, 8
    rng = np.random.RandomState(3)
    a = rng.randn(n_half, d).astype("float32")
    b = rng.randn(n_half, d).astype("float32") + 1000.0  # far cluster
    rows = [
        (int(i), [float(v) for v in vec])
        for i, vec in enumerate(np.vstack([a, b]))
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint(eager=True)
    graph = knn_exact_blocked(emb, 5).select("src", "dst").localCheckpoint(eager=True)
    queries = emb.filter((F.col("vec_id") < 5) | (F.col("vec_id") >= n_half * 2 - 5))
    want = knn_search(queries, emb, 3).collect()

    one_entry = graph_knn_search(queries, graph, emb, 3, beam=8, n_entry=1).collect()
    r_one = _recall(one_entry, want)
    assert r_one <= 0.55, f"one entry point should strand a cluster, recall={r_one}"

    auto = graph_knn_search(queries, graph, emb, 3, beam=8).collect()  # n_entry=None
    r_auto = _recall(auto, want)
    assert r_auto >= 0.9, f"auto entry seeding should bridge both clusters, recall={r_auto}"


def test_graph_search_local_tier_bit_identical(spark, emb, graph):
    # the auto-routed local tier must return EXACTLY the distributed
    # walk's rows — ids, ranks, and float64 distances to the last bit
    # (the local kernel replays l2_sq's sequential per-dim fold)
    queries = emb.filter(F.col("vec_id") < 15)
    for include_self in (True, False):
        loc = graph_knn_search(
            queries, graph, emb, 5, beam=16, route="local",
            include_self=include_self,
        ).collect()
        dist = graph_knn_search(
            queries, graph, emb, 5, beam=16, route="distributed",
            include_self=include_self,
        ).collect()
        key = lambda r: (r["src"], r["rnk"])  # noqa: E731
        l = {key(r): (r["dst"], r["dist_sq"]) for r in loc}
        d = {key(r): (r["dst"], r["dist_sq"]) for r in dist}
        assert l == d, include_self


def test_graph_search_route_validation(spark, emb, graph):
    with pytest.raises(ValueError):
        graph_knn_search(emb.limit(2), graph, emb, 3, route="nope")


def test_graph_search_local_tier_tolerates_dangling_edges(spark, emb, graph):
    # A stale adjacency entry (dst no longer in the corpus) is silently
    # shed by the distributed tier's corpus join; the local tier must
    # shed it identically instead of crashing (advisor round 9).
    q = emb.limit(3)
    dangling = spark.createDataFrame(
        [(int(r["vec_id"]), 10**12) for r in q.collect()], "src long, dst long"
    )
    g2 = graph.unionByName(dangling)
    loc = graph_knn_search(q, g2, emb, k=5, beam=16, route="local").collect()
    dist = graph_knn_search(q, g2, emb, k=5, beam=16, route="distributed").collect()
    key = lambda r: (r["src"], r["rnk"])  # noqa: E731
    assert sorted((r["src"], r["dst"], r["rnk"]) for r in loc) == sorted(
        (r["src"], r["dst"], r["rnk"]) for r in dist
    )
    assert all(r["dst"] != 10**12 for r in loc)


def test_graph_search_distributed_skips_count_when_pinned(spark, emb, graph):
    # route='distributed' + explicit n_entry must not pay the corpus
    # count action (it drives only auto-routing / entry sizing).
    q = emb.limit(2)
    corpus = emb.select("*")
    corpus.count = lambda: (_ for _ in ()).throw(  # instance-level patch
        AssertionError("corpus.count() ran despite pinned route + n_entry")
    )
    graph_knn_search(q, graph, corpus, k=3, beam=8, n_entry=8, route="distributed")
