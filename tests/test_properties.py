"""Property-based kernel tests (SURVEY.md §5.2.3): the NumPy/block tier
must satisfy the algebraic laws the operators rely on. Pure-Python/NumPy
— no SparkSession, so these run in milliseconds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from pyspark_mrdf_spark.functions.vector import pairwise_l2_sq, topk_ids

finite = st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=64)


@st.composite
def matrix_pair(draw):
    d = draw(st.integers(2, 16))
    m = draw(st.integers(1, 8))
    n = draw(st.integers(1, 8))
    a = draw(arrays(np.float64, (m, d), elements=finite))
    b = draw(arrays(np.float64, (n, d), elements=finite))
    return a, b


@given(matrix_pair())
@settings(max_examples=200, deadline=None)
def test_pairwise_l2_sq_matches_naive_and_is_nonnegative(ab):
    a, b = ab
    d2 = pairwise_l2_sq(a, b)
    assert d2.shape == (a.shape[0], b.shape[0])
    assert (d2 >= 0).all()
    naive = np.array([[np.sum((x - y) ** 2) for y in b] for x in a])
    assert np.allclose(d2, naive, rtol=1e-12, atol=1e-9)


@given(matrix_pair())
@settings(max_examples=100, deadline=None)
def test_pairwise_l2_sq_symmetry(ab):
    a, b = ab
    assert np.allclose(pairwise_l2_sq(a, b), pairwise_l2_sq(b, a).T)


@given(
    arrays(np.float64, st.integers(1, 30).map(lambda n: (n,)), elements=finite),
    st.integers(1, 10),
)
@settings(max_examples=200, deadline=None)
def test_topk_ids_sorted_and_bounded(dist, k):
    ids = np.arange(len(dist), dtype=np.int64)
    out = topk_ids(dist, ids, k)
    assert len(out) == min(k, len(dist))
    pairs = [(d, i) for i, d in out]
    assert pairs == sorted(pairs)
    # the selected distances are the k smallest
    kept = sorted(d for d, _ in pairs)
    best = sorted(dist.tolist())[: len(out)]
    assert np.allclose(kept, best)


@given(
    arrays(np.float64, st.integers(2, 30).map(lambda n: (n,)), elements=finite),
    st.integers(1, 10),
)
@settings(max_examples=100, deadline=None)
def test_topk_ids_exclusion(dist, k):
    ids = np.arange(len(dist), dtype=np.int64)
    out = topk_ids(dist, ids, k, exclude=0)
    assert all(i != 0 for i, _ in out)


def test_topk_merge_idempotent_commutative():
    # the G1 merge law: merging a graph with itself (dedup + top-k)
    # changes nothing; merge order doesn't matter
    rng = np.random.default_rng(7)
    edges = {(int(s), int(d)): float(rng.random()) for s in range(5) for d in range(20)}

    def merge(k, *edge_sets):
        allp: dict[tuple[int, int], float] = {}
        for es in edge_sets:
            allp.update(es)
        out = {}
        by_src: dict[int, list] = {}
        for (s, d), w in allp.items():
            by_src.setdefault(s, []).append((w, d))
        for s, lst in by_src.items():
            for w, d in sorted(lst)[:k]:
                out[(s, d)] = w
        return out

    g1 = merge(10, edges)
    assert merge(10, g1, g1) == g1
    half1 = {kv: w for kv, w in edges.items() if kv[1] < 10}
    half2 = {kv: w for kv, w in edges.items() if kv[1] >= 10}
    assert merge(10, half1, half2) == merge(10, half2, half1) == g1


@settings(max_examples=40, deadline=None)
@given(
    st.integers(10, 80).flatmap(
        lambda n: st.tuples(
            arrays(np.float64, (n, 8), elements=st.floats(-1e3, 1e3, width=64)),
            st.integers(1, 9),
            st.integers(0, 5),  # how many rows to duplicate (distance ties)
        )
    )
)
def test_l2_topk_candidates_contains_true_topk(args):
    """The gemm prefilter may only NOMINATE; membership of the true
    exact top-k in the candidate set is the correctness contract."""
    from pyspark_mrdf_spark.functions.vector import l2_topk_candidates

    x, k, n_dup = args
    n = len(x)
    for i in range(min(n_dup, n - 1)):
        x[i + 1] = x[0]  # exact duplicates -> zero distances, worst case for gemm
    cand, d2 = l2_topk_candidates(x, x, k)
    exact = pairwise_l2_sq(x, x)
    for i in range(n):
        true_top = set(np.argsort(exact[i], kind="stable")[:k].tolist())
        got = set(cand[i].tolist())
        assert true_top <= got, f"row {i}: missing {true_top - got}"
        # candidate distances are the EXACT ones, not the gemm estimates
        for pos, j in enumerate(cand[i].tolist()):
            assert d2[i, pos] == exact[i, j]
