"""Round-8 corpus operators: substring-level exact dedup (q101),
SemDeDup (q102), concat-and-chunk sequence packing (q103), DSIR
importance weights (q104) — structural laws beyond the DuckDB-oracle
hash gate (tests/test_oracle_queries.py covers value equality).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from pyspark_mrdf_spark.io import load_table
from pyspark_mrdf_spark.operators.dedup import dup_substring_spans, semantic_dedup
from pyspark_mrdf_spark.operators.similarity import ivf_train_centroids
from pyspark_mrdf_spark.queries import load_all

# NOTE: never import a query MODULE (queries.pipeline etc.) at test
# module level — pytest collects test files alphabetically, and a
# direct module import registers that family's queries ahead of
# load_all()'s canonical order, reordering driver_registry() and
# breaking the pinned-surface test. Pull constants inside the test.


def _chain(seed: str, n_chars: int) -> str:
    """Deterministic filler with no repeated 40-gram anywhere: an md5
    hex chain never cycles within test sizes."""
    out = []
    h = seed
    while sum(len(s) for s in out) < n_chars:
        h = hashlib.md5(h.encode()).hexdigest()
        out.append(h)
    return "".join(out)[:n_chars]


PLANT = "".join(chr(97 + i % 26) for i in range(64))  # 64-char shared run


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, _chain("a", 100) + PLANT + _chain("b", 100)),
        (2, _chain("c", 50) + PLANT + _chain("d", 150)),
        (3, _chain("e", 300)),  # no duplicated substring anywhere
        (4, _chain("f", 80) + PLANT + PLANT + _chain("g", 80)),  # adjacent reps
    ]
    return spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows], "doc_id long, text string, n_chars long"
    )


def _spans_reference(texts: dict[int, str], L: int, S: int, min_count: int = 2):
    """Pure-Python replica of the operator definition: content-defined
    mod-S fingerprint selection, corpus-wide counts, interval merge."""
    occ = []
    for doc, t in texts.items():
        for p in range(len(t) - L + 1):
            fp = hashlib.md5(t[p : p + L].encode()).hexdigest()
            if S == 1 or int(fp[:8], 16) % S == 0:
                occ.append((doc, p, fp))
    from collections import Counter

    cnt = Counter(fp for _, _, fp in occ)
    marked = {}
    for doc, p, fp in occ:
        if cnt[fp] >= min_count:
            marked.setdefault(doc, []).append(p)
    out = {}
    for doc, ps in marked.items():
        spans = []
        for p in sorted(ps):
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + L - 1)
            else:
                spans.append([p, p + L - 1])
        out[doc] = (len(spans), sum(e - s + 1 for s, e in spans))
    return out


def test_substring_spans_planted(planted):
    texts = {r["doc_id"]: r["text"] for r in planted.collect()}
    for S in (1, 4):
        got = {
            r["doc_id"]: (r["n_spans"], r["dup_chars"])
            for r in dup_substring_spans(planted, gram_len=40, sample_mod=S).collect()
        }
        want = _spans_reference(texts, 40, S)
        assert got == want, f"sample_mod={S}"
        # doc 3 has no duplicated 40-gram anywhere: never reported
        assert 3 not in got
        # the 64-char plant shared by docs 1/2/4 is detected (content-
        # defined selection is alignment-free, so differing offsets
        # cannot hide it), covering most of the run
        for doc in (1, 2):
            n_spans, dup_chars = got[doc]
            assert n_spans == 1 and dup_chars >= 40
        # doc 4's back-to-back repeat is found; at S>1 the sampled
        # marks may resolve the 128-char run as 1-2 spans
        n_spans, dup_chars = got[4]
        assert 1 <= n_spans <= 2 and dup_chars >= 100


def test_substring_spans_exact_at_mod1(planted):
    # sample_mod=1 keeps every gram: the span over a planted 64-char
    # run is EXACTLY the run (detection guarantee with no sampling)
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_chars"])
        for r in dup_substring_spans(planted, gram_len=40, sample_mod=1).collect()
    }
    assert got[1] == (1, 64)
    assert got[2] == (1, 64)
    assert got[4] == (1, 128)
    assert 3 not in got


def test_semantic_dedup_matches_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_train_centroids(emb, n_centroids=8, sample_size=512, iters=8, seed=7)
    got = {
        r["vec_id"]: (r["cluster"], r["max_prev_cos_e6"], r["keep"])
        for r in semantic_dedup(emb, cents, threshold_e6=350000).collect()
    }

    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    from pyspark_mrdf_spark.functions.vector import pairwise_l2_sq
    from pyspark_mrdf_spark.operators.dedup import _cos_e6_block

    assign = np.argsort(pairwise_l2_sq(mat, cents), axis=1, kind="stable")[:, 0]
    want = {}
    for j in range(len(cents)):
        sel = assign == j
        cids, cmat = ids[sel], mat[sel]
        ce = _cos_e6_block(cmat, cmat)
        mask = cids[:, None] > cids[None, :]
        none = -(2 * 10**6)
        best = np.where(mask, ce, none).max(axis=1)
        for i, vid in enumerate(cids):
            want[int(vid)] = (
                j,
                int(best[i]) if best[i] != none else -1,
                bool(best[i] < 350000),
            )
    assert got == want
    # non-vacuous: the corpus has planted semantic dups
    assert sum(1 for _, _, k in got.values() if not k) > 0


def test_semantic_dedup_keeps_cluster_minimum(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_train_centroids(emb, n_centroids=8, sample_size=512, iters=8, seed=7)
    rows = semantic_dedup(emb, cents, threshold_e6=350000).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for members in by_cluster.values():
        lowest = min(members, key=lambda r: r["vec_id"])
        assert lowest["keep"] and lowest["max_prev_cos_e6"] == -1


def test_pack_sequences_conservation(spark, sf_dir):
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.queries.pipeline import PACK_SEQ_LEN

    q = load_all()["q103_pack_sequences"]
    out = q.builder(spark, sf_dir).cache()
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("tok")
    )
    # every doc's pieces sum to its token count
    per_doc = out.groupBy("doc_id").agg(F.sum("n_tok").alias("s"))
    bad = per_doc.join(d, "doc_id").filter(F.col("s") != F.col("tok")).count()
    assert bad == 0
    # every sequence except the last of its shard holds exactly SEQ_LEN
    per_seq = out.groupBy("shard", "seq").agg(F.sum("n_tok").alias("s"))
    last = per_seq.groupBy("shard").agg(F.max("seq").alias("seq"))
    full = per_seq.join(last, ["shard", "seq"], "left_anti")
    assert full.filter(F.col("s") != PACK_SEQ_LEN).count() == 0
    # pieces tile each sequence: offsets are disjoint and contiguous
    rows = out.orderBy("shard", "seq", "offset_in_seq").collect()
    pos = {}
    for r in rows:
        key = (r["shard"], r["seq"])
        expect = pos.get(key, 0)
        assert r["offset_in_seq"] == expect, key
        assert r["n_tok"] >= 1
        pos[key] = expect + r["n_tok"]
    out.unpersist()


def test_dsir_selects_top_fraction(spark, sf_dir):
    rows = load_all()["q104_dsir_importance"].builder(spark, sf_dir).collect()
    n = len(rows)
    n_sel = sum(1 for r in rows if r["selected"])
    assert n_sel == math.ceil(0.25 * n)
    for r in rows:
        assert 0 <= r["dsir_num"] <= r["dsir_den"]
        assert r["ratio_e6"] == r["dsir_num"] * 1000000 // r["dsir_den"]
    # the selected set is exactly the top-(ratio, doc_id) prefix
    order = sorted(rows, key=lambda r: (-r["ratio_e6"], r["doc_id"]))
    assert all(r["selected"] for r in order[:n_sel])
    assert not any(r["selected"] for r in order[n_sel:])


def test_bpe_core_textbook():
    """Sennrich et al.'s canonical example: corpus {low:5, lower:2,
    newest:6, widest:3} — first merges must join the frequent 'es't'
    suffix pair family deterministically."""
    from pyspark_mrdf_spark.functions.bpe import bpe_merges, bpe_segment

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_merges(wc, 10)
    # 'e','s' occurs in newest+widest = 9 — the unambiguous top pair
    assert merges[0][:2] == ("e", "s") and merges[0][2] == 9
    assert merges[1][:2] == ("es", "t") and merges[1][2] == 9
    # after enough merges the most frequent full words become single
    # tokens ending in </w>
    seg = bpe_segment("newest", merges)
    assert "".join(seg) == "newest</w>"
    assert len(seg) < len("newest") + 1  # merging actually happened
    # determinism: same input, same table
    assert bpe_merges(dict(reversed(list(wc.items()))), 10) == merges


def test_bpe_segment_consistency(spark, sf_dir):
    """q108's per-doc subword counts equal segmenting the raw text
    with q107's trained table, word by word."""
    from pyspark_mrdf_spark.functions.bpe import bpe_segment
    from pyspark_mrdf_spark.queries import load_all

    merges_rows = load_all()["q107_bpe_train"].builder(spark, sf_dir).collect()
    merges = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in sorted(merges_rows, key=lambda r: r["rank"])
    ]
    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in load_all()["q108_bpe_tokenize"].builder(spark, sf_dir).collect()
    }
    for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50).collect():
        ws = r["text"].split(" ")
        want = sum(len(bpe_segment(w, merges)) for w in ws)
        assert got[r["doc_id"]] == (len(ws), want)


def _sb_reference(train_texts, score_texts):
    """Driver-side stupid-backoff replica (dict counts, same integer
    fixed point) — the independent implementation the distributed
    scorer must match token-for-token."""
    from collections import Counter

    uni, bi, tri = Counter(), Counter(), Counter()
    for txt in train_texts:
        t = ["<s>", "<s>"] + txt.split(" ")
        uni.update(t)
        bi.update(zip(t, t[1:]))
        tri.update(zip(t, t[1:], t[2:]))
    n = sum(uni.values())
    out = {}
    for i, txt in enumerate(score_texts):
        t = ["<s>", "<s>"] + txt.split(" ")
        sc, oov = [], 0
        for j in range(2, len(t)):
            w1, w2, w3 = t[j - 2], t[j - 1], t[j]
            if tri[(w1, w2, w3)]:
                sc.append(1_000_000 * tri[(w1, w2, w3)] // bi[(w1, w2)])
            elif bi[(w2, w3)]:
                sc.append(400_000 * bi[(w2, w3)] // uni[w2])
            elif uni[w3]:
                sc.append(160_000 * uni[w3] // n)
            else:
                sc.append(0)
                oov += 1
        out[i] = (len(sc), sum(sc), sum(sc) // len(sc), oov)
    return out


def test_lm_score_matches_bruteforce_and_ranks(spark):
    # the stupid-backoff laws: (1) the distributed scorer equals an
    # independent driver-side replica exactly (integer fixed point ⇒
    # no tolerance); (2) an in-domain doc outranks a noise doc and
    # OOV tokens are counted, the property the CCNet band filter uses
    from pyspark_mrdf_spark.operators.lm import lm_score, lm_train

    train = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox sleeps under the old tree",
        "a quick brown fox jumps over a lazy dog",
    ]
    score = [
        "the quick brown fox jumps over the lazy dog",  # in-domain
        "fox the over quick dog brown lazy the jumps",  # shuffled
        "zzq qqz xxv unseen tokens only here vvx",      # OOV-heavy
    ]
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], ["doc_id", "text"]
    )
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score)], ["doc_id", "text"]
    )
    tri, bi, uni = lm_train(tdf)
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_score_e6"], r["mean_score_e6"], r["n_oov"])
        for r in lm_score(sdf, tri, bi, uni).collect()
    }
    want = _sb_reference(train, score)
    assert got == want
    assert got[0][2] > got[1][2] > got[2][2]
    assert got[2][3] >= 5 and got[0][3] == 0


def test_lm_min_count_prunes_only_rare_ngrams(spark):
    # pruning law: min_count=2 removes singleton bi/trigrams (backing
    # those tokens off to a lower tier — score can only drop) and
    # never changes unigrams, so OOV is pruning-invariant
    from pyspark_mrdf_spark.operators.lm import lm_score, lm_train

    train = [
        "alpha beta gamma delta",
        "alpha beta gamma epsilon",
        "alpha beta zeta eta",
    ]
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], ["doc_id", "text"]
    )
    full = lm_score(tdf, *lm_train(tdf))
    pruned = lm_score(tdf, *lm_train(tdf, min_count=2))
    f = {r["doc_id"]: r for r in full.collect()}
    p = {r["doc_id"]: r for r in pruned.collect()}
    for i in f:
        assert p[i]["sum_score_e6"] <= f[i]["sum_score_e6"]
        assert p[i]["n_oov"] == f[i]["n_oov"]
    # "alpha beta" (3x) survives pruning: doc scores stay > 0
    assert all(p[i]["sum_score_e6"] > 0 for i in p)


def test_lm_crosscorpus_ranks_reference_language(spark, sf_dir):
    # the CCNet band signal: under a model trained ONLY on the
    # lang='en' subset, en documents score higher and carry fewer OOV
    # tokens than the other languages — in aggregate, which is how the
    # band filter consumes the scores
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.io import load_table
    from pyspark_mrdf_spark.operators.lm import lm_score, lm_train

    d = load_table(spark, sf_dir, "documents")
    tri, bi, uni = lm_train(d.filter(F.col("lang") == "en"))
    per_lang = {
        r["lang"]: (r["m"], r["oov"])
        for r in (
            lm_score(d, tri, bi, uni)
            .join(d.select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(
                F.avg("mean_score_e6").alias("m"),
                F.avg(F.col("n_oov") / F.col("n_tokens")).alias("oov"),
            )
            .collect()
        )
    }
    others = [l for l in per_lang if l != "en"]
    assert others and all(per_lang["en"][0] > per_lang[l][0] for l in others)
    assert all(per_lang["en"][1] <= per_lang[l][1] for l in others)


# --- pagerank (q113 / operators/graph.py) ----------------------------


def test_pagerank_ring_is_uniform(spark):
    # a directed ring: perfect symmetry, so every node must hold
    # exactly the same rank after any number of rounds
    from pyspark_mrdf_spark.operators.graph import pagerank

    n = 64
    edges = spark.range(n).selectExpr("id AS src", f"(id + 1) % {n} AS dst")
    ranks = pagerank(edges, n_iter=5).collect()
    assert len(ranks) == n
    assert len({r["p"] for r in ranks}) == 1


def test_pagerank_star_center_dominates_and_mass_conserves(spark):
    # star: leaves 1..n-1 -> 0, 0 -> 1. The center accumulates the
    # leaves' mass; with every node having out-degree >= 1, total mass
    # is conserved up to integer-division truncation (< 1 unit lost
    # per node per round)
    from pyspark_mrdf_spark.operators.graph import pagerank

    n, scale, rounds = 50, 10**12, 5
    leaves = spark.range(1, n).selectExpr("id AS src", "CAST(0 AS BIGINT) AS dst")
    edges = leaves.unionByName(
        spark.createDataFrame([(0, 1)], "src: bigint, dst: bigint")
    )
    ranks = {r["node"]: r["p"] for r in pagerank(edges, n_iter=rounds, scale=scale).collect()}
    assert len(ranks) == n
    assert ranks[0] == max(ranks.values())
    assert ranks[0] > 10 * ranks[2]  # a leaf, far below the hub
    total = sum(ranks.values())
    assert scale - n * rounds <= total <= scale


def test_pagerank_matches_numpy_float_reference(spark):
    # the integer fixed-point iteration tracks the textbook float
    # power iteration to within truncation error on a random graph
    import numpy as np

    from pyspark_mrdf_spark.operators.graph import pagerank

    rng = np.random.default_rng(7)
    n, scale = 40, 10**12
    out = {u: rng.choice(n, size=rng.integers(1, 4), replace=True) for u in range(n)}
    pairs = [(int(u), int(v)) for u, vs in out.items() for v in vs]
    edges = spark.createDataFrame(pairs, "src: bigint, dst: bigint")
    got = {r["node"]: r["p"] for r in pagerank(edges, n_iter=5, scale=scale).collect()}

    p = np.full(n, 1.0 / n)
    for _ in range(5):
        nxt = np.full(n, 0.15 / n)
        for u, vs in out.items():
            for v in vs:
                nxt[v] += 0.85 * p[u] / len(vs)
        p = nxt
    for u in range(n):
        # <= 1 unit truncation per division per round, amplified < 2x
        assert abs(got[u] / scale - p[u]) < 1e-8


def test_pagerank_rejects_empty():
    import pytest as _pytest

    from pyspark_mrdf_spark.operators.graph import pagerank
    from pyspark_mrdf_spark.session import get_spark

    spark = get_spark()
    empty = spark.createDataFrame([], "src: bigint, dst: bigint")
    with _pytest.raises(ValueError, match="empty node set"):
        pagerank(empty)


def test_hybrid_rrf_fusion_laws(spark, sf_dir):
    """RRF structural laws (q120): the fused list is a subset of the
    two legs' union; a doc present in BOTH legs outranks one with the
    same single-leg rank (two reciprocal terms beat one); every query
    returns exactly 10 fused rows; and fused rank 1 carries the
    highest RRF score."""
    from pyspark_mrdf_spark.queries import load_all

    rows = load_all()["q120_hybrid_rrf_retrieval"].builder(spark, sf_dir).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert len(by_q) == 3
    for qid, rs in by_q.items():
        assert len(rs) == 10, (qid, len(rs))
        rs = sorted(rs, key=lambda r: r["frnk"])
        # rrf non-increasing down the fused ranking
        assert all(a["rrf"] >= b["rrf"] for a, b in zip(rs, rs[1:]))
        for r in rs:
            assert r["lex_rnk"] > 0 or r["vec_rnk"] > 0  # union membership
            # reconstruct the fused score from the exposed leg ranks
            want = (1.0 / (60 + r["lex_rnk"]) if r["lex_rnk"] else 0.0) + (
                1.0 / (60 + r["vec_rnk"]) if r["vec_rnk"] else 0.0
            )
            assert r["rrf"] == want, (qid, r)


# --- triangle counting (q138 / operators/graph.py) ----------------------


def test_triangles_k4(spark):
    # K4: 4 triangles, every node participates in C(3,2) = 3
    from pyspark_mrdf_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b], ["src", "dst"]
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_match_bruteforce_and_input_shape_invariance(spark):
    from itertools import combinations
    import random

    from pyspark_mrdf_spark.operators.graph import triangle_counts

    rng = random.Random(42)
    n = 40
    und = {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.15}
    adj = {v: set() for v in range(n)}
    for a, b in und:
        adj[a].add(b); adj[b].add(a)
    expected: dict[int, int] = {}
    for trio in combinations(range(n), 3):
        a, b, c = trio
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in trio:
                expected[v] = expected.get(v, 0) + 1
    # feed edges in MIXED direction with duplicates and self-loops:
    # the operator must canonicalize
    rows = []
    for a, b in und:
        rows.append((b, a) if rng.random() < 0.5 else (a, b))
        if rng.random() < 0.2:
            rows.append((a, b))
    rows += [(5, 5), (7, 7)]
    edges = spark.createDataFrame(rows, ["src", "dst"]).repartition(7)
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == expected
    assert sum(got.values()) % 3 == 0


# --- fuzzy linkage (q139 / operators/linkage.py) ------------------------


def test_blocked_link_single_edits(spark):
    from pyspark_mrdf_spark.operators.linkage import blocked_levenshtein_link

    clean = spark.createDataFrame(
        [("small ring",), ("red widget",), ("blue bolt",)], ["name"]
    )
    dirty = spark.createDataFrame(
        [
            (1, "smll ring"),    # deletion mid-word: prefix block misses, suffix hits? (prefix 'sml' != 'sma') -> suffix 'ing' hits
            (2, "red widge"),    # deletion at end: prefix block hits
            (3, "zzz nothing"),  # no match within dist 1
        ],
        ["rec_id", "name"],
    )
    got = {
        r["rec_id"]: (r["matched_name"], r["dist"])
        for r in blocked_levenshtein_link(dirty, clean).collect()
    }
    assert got == {1: ("small ring", 1), 2: ("red widget", 1)}


def test_blocked_link_tie_breaks_deterministically(spark):
    from pyspark_mrdf_spark.operators.linkage import blocked_levenshtein_link

    # "cat" is distance 1 from both "bat" and "cap": (dist, name) argmin
    # must pick "bat" on every partitioning
    clean = spark.createDataFrame([("bat",), ("cap",)], ["name"])
    dirty = spark.createDataFrame([(1, "cat")], ["rec_id", "name"])
    rows = blocked_levenshtein_link(
        dirty.repartition(4), clean.repartition(3), prefix_len=1
    ).collect()
    assert [(r["matched_name"], r["dist"]) for r in rows] == [("bat", 1)]


def test_blocked_link_max_block_stoplist(spark):
    from pyspark_mrdf_spark.operators.linkage import blocked_levenshtein_link

    # a non-discriminative prefix family ("aaa ...", 5 clean names) vs a
    # discriminative one ("red widget"): with max_block=4 the hot "aaa"
    # prefix block is dropped, so the family member is only reachable
    # through its (cold) suffix block; a family member whose BOTH keys
    # are hot would get no candidates — the documented recall cost
    clean = spark.createDataFrame(
        [(f"aaa name {i}",) for i in range(5)] + [("red widget",)], ["name"]
    )
    dirty = spark.createDataFrame(
        [(1, "aaa name 3x"), (2, "red widge")], ["rec_id", "name"]
    )
    # uncapped: both link
    full = {
        r["rec_id"]: r["matched_name"]
        for r in blocked_levenshtein_link(dirty, clean).collect()
    }
    assert full == {1: "aaa name 3", 2: "red widget"}
    # r13: the DEFAULT hot-block action is the exact SPLIT — capping
    # loses nothing (the law tests/test_linkage.py pins exhaustively)
    split = {
        r["rec_id"]: r["matched_name"]
        for r in blocked_levenshtein_link(dirty, clean, max_block=4).collect()
    }
    assert split == full
    capped = {
        r["rec_id"]: r["matched_name"]
        for r in blocked_levenshtein_link(
            dirty, clean, max_block=4, hot_block_action="drop"
        ).collect()
    }
    # the r12 stoplist dial: rec 1's prefix block ('aaa') is dropped;
    # its suffix block (' 3x') matches no clean suffix -> record
    # absent. rec 2 unaffected.
    assert capped == {2: "red widget"}
    # max_block above every block size = identical to uncapped
    same = {
        r["rec_id"]: r["matched_name"]
        for r in blocked_levenshtein_link(dirty, clean, max_block=100).collect()
    }
    assert same == full


# --- k-core + label propagation (q140/q141 / operators/graph.py) --------


def test_kcore_clique_survives_tail_peels(spark):
    from pyspark_mrdf_spark.operators.graph import kcore_peel

    # K5 (deg 4) with a 3-node tail hanging off node 0: the tail peels
    # one node per round at k=2... at k=3 the whole tail drops round 1
    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    tail = [(0, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(k5 + tail, ["src", "dst"])
    got = {r["node"]: r["deg"] for r in kcore_peel(edges, k=3, rounds=3).collect()}
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}


def test_kcore_fixed_rounds_partial_peel_is_defined(spark):
    from pyspark_mrdf_spark.operators.graph import kcore_peel

    # pure path of 6 nodes at k=2: endpoints peel each round from both
    # ends; rounds=1 must leave the 4 inner nodes, rounds=3 empties it
    path = [(i, i + 1) for i in range(5)]
    edges = spark.createDataFrame(path, ["src", "dst"])
    r1 = {r["node"] for r in kcore_peel(edges, k=2, rounds=1).collect()}
    assert r1 == {1, 2, 3, 4}
    assert kcore_peel(edges, k=2, rounds=3).count() == 0


def _lpa_reference(und_edges, rounds):
    # brute-force replica of the synchronous rule: most frequent
    # neighbor label, ties to smallest
    adj = {}
    for a, b in und_edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v, nbrs in adj.items():
            counts = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            nxt[v] = min(counts, key=lambda l: (-counts[l], l))
        labels = nxt
    return labels


def test_label_propagation_matches_reference(spark):
    import random

    from pyspark_mrdf_spark.operators.graph import label_propagation

    rng = random.Random(3)
    # two dense blobs + one bridge: communities must separate
    und = {(a, b) for a in range(8) for b in range(a + 1, 8) if rng.random() < 0.8}
    und |= {(a, b) for a in range(20, 28) for b in range(a + 1, 28) if rng.random() < 0.8}
    und.add((0, 20))
    for rounds in (1, 3):
        expected = _lpa_reference(und, rounds)
        got = {
            r["node"]: r["label"]
            for r in label_propagation(
                spark.createDataFrame(sorted(und), ["src", "dst"]).repartition(5),
                rounds=rounds,
            ).collect()
        }
        assert got == expected, f"rounds={rounds}"
    # the two blobs end in different communities after 3 rounds
    final = _lpa_reference(und, 3)
    assert {final[v] for v in range(8) if v in final} != {
        final[v] for v in range(20, 28) if v in final
    }


# --- data-quality gate (q144 / operators/quality.py) --------------------


def test_quality_report_counts_planted_violations(spark):
    from pyspark_mrdf_spark.operators.quality import (
        InSet,
        NotNull,
        Satisfies,
        Unique,
        quality_report,
        referential_report,
    )

    df = spark.createDataFrame(
        [
            (1, "ok", "en", 2),
            (1, None, "en", 0),       # dup id + null text + n=0 vs null len
            (2, "abc", "xx", 3),      # bad lang
            (3, "abcd", "de", 9),     # inconsistent n
            (None, "x", "fr", 1),     # null id is not a uniqueness key
        ],
        ["doc_id", "text", "lang", "n"],
    )
    got = {
        r["check_name"]: (r["violations"], r["passed"])
        for r in quality_report(
            df,
            [
                NotNull("text"),
                Unique("doc_id"),
                InSet("lang", ("en", "de", "fr")),
                Satisfies("n = length(text)", "n_consistent"),
            ],
        ).collect()
    }
    assert got == {
        "not_null(text)": (1, False),
        "unique(doc_id)": (1, False),
        "in_set(lang)": (1, False),
        # NULL predicate (length(NULL)) counts as a violation: rows 2 and 4
        "satisfies(n_consistent)": (2, False),
    }
    parent = spark.createDataFrame([(1,), (2,)], ["k"])
    child = spark.createDataFrame([(1,), (7,), (None,), (2,), (9,)], ["fk"])
    rows = referential_report(child, "fk", parent, "k", "fk->k").collect()
    assert [(r["check_name"], r["violations"], r["passed"]) for r in rows] == [
        ("references(fk->k)", 2, False)
    ]


def test_personalized_pagerank_matches_integer_replica(spark):
    # ring 0->1->...->9->0, seed {0}: the engine must equal a direct
    # replica of the integer recurrence bit-for-bit, and mass beyond
    # the 5-round propagation horizon must be exactly 0
    from pyspark_mrdf_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {
        r["node"]: r["p"]
        for r in pagerank(edges, n_iter=5, seeds=seeds).collect()
    }
    scale, rounds = 10**12, 5
    base = {v: (scale * 15) // 100 if v == 0 else 0 for v in range(10)}
    p = {v: scale if v == 0 else 0 for v in range(10)}
    for _ in range(rounds):
        p = {v: base[v] + (85 * (p[(v - 1) % 10] // 1)) // 100 for v in range(10)}
    assert got == p
    # the initial pulse sits at distance 5 (0.85^5 of the seed mass);
    # nothing has reached distance 6+ yet
    assert got[6] == 0 and got[9] == 0
    # empty seed set must be rejected
    import pytest

    with pytest.raises(ValueError):
        pagerank(edges, seeds=spark.createDataFrame([], "node long"))


def test_ppr_full_damping_keeps_seed_mass(spark):
    # damping_e2=100 is in the validated range: teleport base is 0 for
    # EVERY node, so seed detection must come from the _seed flag, not
    # `_base > 0` (which zeroed the initial distribution; advisor r9).
    from pyspark_mrdf_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    ranks = {r["node"]: r["p"] for r in pagerank(
        edges, n_iter=3, damping_e2=100, scale=10**6, seeds=seeds
    ).collect()}
    # all mass started at seed 0 and walks the ring: after 3 full-damping
    # rounds it sits on node 0 again — definitely not all-zero
    assert sum(ranks.values()) > 0
    assert ranks[0] == 10**6


def test_ppr_seed_outside_universe_does_not_leak_mass(spark):
    # a seed absent from the node set must not inflate the teleport
    # denominator (silent per-round mass leak); only joined seeds count.
    from pyspark_mrdf_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    seeds_in = spark.createDataFrame([(0,)], "node long")
    seeds_mixed = spark.createDataFrame([(0,), (999,)], "node long")
    a = sorted(pagerank(edges, n_iter=4, seeds=seeds_in, scale=10**9).collect())
    b = sorted(pagerank(edges, n_iter=4, seeds=seeds_mixed, scale=10**9).collect())
    assert a == b

    seeds_none = spark.createDataFrame([(999,)], "node long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no seed is present"):
        pagerank(edges, n_iter=2, seeds=seeds_none)


def test_weighted_sample_laws(spark, sf_dir):
    """q156 (A-Res weighted sampling): per-source size is exactly N,
    ranks are 1..N, no replacement, and weighting actually biases —
    across seeds, the mean token count of sampled docs exceeds the
    corpus mean (heavier docs are proportionally likelier)."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.io import load_table
    from pyspark_mrdf_spark.queries.pipeline import (
        _WSAMPLE_PER_SOURCE,
        capped_per_key,
        q156_weighted_sample,
    )

    out = q156_weighted_sample(spark, sf_dir).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for rows in by_src.values():
        assert len(rows) == _WSAMPLE_PER_SOURCE
        assert sorted(r["rank"] for r in rows) == list(range(1, _WSAMPLE_PER_SOURCE + 1))
        ids = [r["doc_id"] for r in rows]
        assert len(set(ids)) == len(ids)

    d = load_table(spark, sf_dir, "documents")
    corpus_mean = d.select(
        F.avg(F.size(F.split("text", " ")).cast("bigint")).alias("m")
    ).collect()[0]["m"]
    sample_mean = sum(r["w"] for r in out) / len(out)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_token_budget_selection_laws(spark, sf_dir):
    """q157: per-source cumulative tokens never exceed the budget, the
    selection is greedy-by-quality (the kept set is a prefix of the
    (ttr desc, doc_id) order), and adding the next-best doc would
    overflow the budget (maximality)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from pyspark_mrdf_spark.queries.pipeline import (
        _TOKEN_BUDGET_PER_SOURCE,
        q157_token_budget_selection,
    )
    from pyspark_mrdf_spark.io import load_table

    out = q157_token_budget_selection(spark, sf_dir)
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        assert max(r["cum_tok"] for r in rs) <= _TOKEN_BUDGET_PER_SOURCE

    # maximality + prefix property from the full ranked list
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    q = d.select(
        "source", "doc_id",
        F.size(toks).cast("bigint").alias("n_tok"),
        F.expr(
            "(CAST(1000000 AS BIGINT) * size(array_distinct(split(text, ' ')))) "
            "div size(split(text, ' '))"
        ).alias("ttr_e6"),
    ).filter(F.col("n_tok") > 0)
    w = Window.partitionBy("source").orderBy(F.col("ttr_e6").desc(), "doc_id")
    ranked = q.withColumn("pos", F.row_number().over(w)).collect()
    full = {}
    for r in ranked:
        full.setdefault(r["source"], []).append(r)
    for src, rs in full.items():
        rs.sort(key=lambda r: r["pos"])
        kept = {r["doc_id"] for r in by_src.get(src, [])}
        cum = 0
        for r in rs:
            if cum + r["n_tok"] <= _TOKEN_BUDGET_PER_SOURCE:
                cum += r["n_tok"]
                assert r["doc_id"] in kept, f"greedy prefix broken at {src}"
            else:
                assert r["doc_id"] not in kept
                break  # first overflow ends the prefix
