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
    clusters is two components; ONE global entry point (the pre-r12
    dial, kept measurable as entry_strategy='global') strands every
    query whose cluster the entry missed (recall ~0.5 across a query
    set drawn from both), while the DEFAULT component-aware seeding
    bridges both even at that starved n_entry dial — coverage is
    exact, not coupon-collector. Pins both the failure mode and the
    default fix the docstring claims."""
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

    one_entry = graph_knn_search(
        queries, graph, emb, 3, beam=8, n_entry=1, entry_strategy="global"
    ).collect()
    r_one = _recall(one_entry, want)
    assert r_one <= 0.55, f"one global entry should strand a cluster, recall={r_one}"

    # the DEFAULT strategy at the SAME starved dial: component seeding
    # adds one entry per component, so nothing is stranded
    one_comp = graph_knn_search(queries, graph, emb, 3, beam=8, n_entry=1).collect()
    r_comp = _recall(one_comp, want)
    assert r_comp >= 0.9, f"component seeding should bridge, recall={r_comp}"

    auto = graph_knn_search(queries, graph, emb, 3, beam=8).collect()  # all defaults
    r_auto = _recall(auto, want)
    assert r_auto >= 0.9, f"default seeding should bridge both clusters, recall={r_auto}"

    # tier bit-identity must hold for the component entry set too: the
    # distributed CC + argmin window and the local union-find must
    # seed the SAME entries (ids, ranks, and distances then follow)
    dist = graph_knn_search(
        queries, graph, emb, 3, beam=8, n_entry=1, route="distributed"
    ).collect()
    assert sorted((r["src"], r["rnk"], r["dst"]) for r in one_comp) == sorted(
        (r["src"], r["rnk"], r["dst"]) for r in dist
    )


def test_graph_search_component_entries_match_tiers(spark):
    """component_entries (distributed CC + md5-argmin window) returns
    exactly one entry per component, and precomputed ``entries=``
    (the index-build-time amortization path) replays the default
    seeding bit-identically on a multi-component graph."""
    import numpy as np

    from pyspark_mrdf_spark.operators.graph_search import component_entries

    n_half, d = 60, 8
    rng = np.random.RandomState(7)
    a = rng.randn(n_half, d).astype("float32")
    b = rng.randn(n_half, d).astype("float32") + 500.0
    c = rng.randn(n_half, d).astype("float32") - 500.0
    rows = [
        (int(i), [float(v) for v in vec])
        for i, vec in enumerate(np.vstack([a, b, c]))
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint(eager=True)
    graph = knn_exact_blocked(emb, 4).select("src", "dst").localCheckpoint(eager=True)

    ents = component_entries(graph, emb)
    got = sorted(r["vid"] for r in ents.collect())
    assert len(got) == 3  # one per planted component
    # the three entries live in three different thirds of the id space
    assert sorted(v // n_half for v in got) == [0, 1, 2]

    # entries= replays the default (global ∪ component) seeding exactly
    n_entry = max(4, int(np.sqrt(3 * n_half - 1)) + 1)
    import hashlib

    all_ids = list(range(3 * n_half))
    glob = sorted(
        all_ids, key=lambda v: hashlib.md5(f"13:{v}".encode()).hexdigest()
    )[:n_entry]
    pre = spark.createDataFrame(
        [(int(v),) for v in sorted(set(glob) | set(got))], "vid long"
    )
    queries = emb.filter(F.col("vec_id") % 29 == 0)
    dflt = graph_knn_search(queries, graph, emb, 3, beam=8).collect()
    via_pre = graph_knn_search(queries, graph, emb, 3, beam=8, entries=pre).collect()
    key = lambda r: (r["src"], r["rnk"])  # noqa: E731
    assert {key(r): (r["dst"], r["dist_sq"]) for r in dflt} == {
        key(r): (r["dst"], r["dist_sq"]) for r in via_pre
    }


def test_graph_search_entry_strategy_validation(spark, emb, graph):
    with pytest.raises(ValueError, match="entry_strategy"):
        graph_knn_search(emb.limit(1), graph, emb, 3, entry_strategy="nope")


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
