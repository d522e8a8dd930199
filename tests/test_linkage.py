"""Blocked record linkage: the hot-block bound's SPLIT action must be
exact (capped == uncapped match set — the r13 law that replaced the
r12 stoplist's measured 0.873 agreement), the deletion-neighborhood
expression must match a sequential replica, and the drop action must
keep its documented (lossy) semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_mrdf_spark.operators.linkage import (
    _deletion_variants,
    blocked_levenshtein_link,
)


def _variants_py(s: str, n_del: int) -> set[str]:
    out = {s}
    cur = {s}
    for _ in range(n_del):
        cur = {x[:i] + x[i + 1 :] for x in cur for i in range(len(x))}
        out |= cur
    return out


@pytest.mark.parametrize("n_del", [1, 2])
def test_deletion_variants_expression_matches_replica(spark, n_del):
    names = ["", "a", "ab", "abc", "hello", "aaaa", "Customer#0042"]
    df = spark.createDataFrame([(n,) for n in names], "s string")
    got = df.select(
        "s", _deletion_variants(F.col("s"), n_del).alias("v")
    ).collect()
    for r in got:
        assert set(r["v"]) == _variants_py(r["s"], n_del), r["s"]
        assert len(r["v"]) == len(set(r["v"]))  # deduped


@pytest.mark.parametrize("n_del", [1, 2])
def test_deletion_neighborhood_blocks_within_distance_pairs(n_del):
    # the SymDelete law the split action stands on: within-distance
    # pairs ALWAYS share a variant (exactness), checked exhaustively
    # over an alphabet small enough to force collisions
    import itertools

    def lev(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    words = ["".join(w) for n in (2, 3, 4) for w in itertools.product("ab", repeat=n)]
    for x in words:
        vx = _variants_py(x, n_del)
        for y in words:
            if lev(x, y) <= n_del:
                assert vx & _variants_py(y, n_del), (x, y)


def _hot_corpus(spark, n_family=120):
    """A name family sharing one 3-char prefix (the hot block) plus
    cold names; dirty = family members minus their sentinel LAST char,
    so the truncated suffix key ("042") collides with no clean suffix
    key (all end in the sentinel, "42X") and the ONLY block that can
    link a dirty record is the hot prefix block."""
    clean_names = [f"AAA-{i:04d}X" for i in range(n_family)] + [
        f"B{i:02d}-zzz-{i:04d}" for i in range(40)
    ]
    clean = spark.createDataFrame([(n,) for n in clean_names], "name string")
    dirty_rows = [(i, f"AAA-{i:04d}") for i in range(0, n_family, 3)]
    dirty = spark.createDataFrame(dirty_rows, "rec_id long, name string")
    return dirty, clean


def _rows(df):
    return sorted(
        (r["rec_id"], r["name"], r["matched_name"], r["dist"])
        for r in df.collect()
    )


def test_split_equals_uncapped_where_drop_loses(spark):
    dirty, clean = _hot_corpus(spark)
    uncapped = _rows(blocked_levenshtein_link(dirty, clean))
    split = _rows(
        blocked_levenshtein_link(dirty, clean, max_block=50)
    )
    dropped = _rows(
        blocked_levenshtein_link(
            dirty, clean, max_block=50, hot_block_action="drop"
        )
    )
    assert len(uncapped) == dirty.count()  # every record has its match
    # the law: splitting an oversized block loses NOTHING
    assert split == uncapped
    # the stoplist loses every match on this corpus (the only linking
    # block is the hot one) — the measured failure mode split fixes
    assert dropped == []


def test_split_exact_at_max_dist_2(spark):
    dirty, clean = _hot_corpus(spark)
    # two deletions: both the last char AND an interior char
    dirty2 = dirty.select(
        "rec_id",
        F.concat(
            F.substring("name", 1, 3), F.expr("substring(name, 5)")
        ).alias("name"),
    )
    kw = dict(max_dist=2)
    uncapped = _rows(blocked_levenshtein_link(dirty2, clean, **kw))
    split = _rows(
        blocked_levenshtein_link(dirty2, clean, max_block=50, **kw)
    )
    assert split == uncapped
    assert len(uncapped) == dirty2.count()


def test_cold_blocks_unaffected_by_the_dial(spark):
    # names whose blocks are all small: every action is a no-op
    clean = spark.createDataFrame(
        [(f"N{i:03d}-xyz{i:03d}",) for i in range(60)], "name string"
    )
    dirty = spark.createDataFrame(
        [(i, f"N{i:03d}-xyz{i:03d}"[:-1]) for i in range(0, 60, 5)],
        "rec_id long, name string",
    )
    base = _rows(blocked_levenshtein_link(dirty, clean))
    for action in ("split", "drop"):
        assert base == _rows(
            blocked_levenshtein_link(
                dirty, clean, max_block=50, hot_block_action=action
            )
        )


def test_validation(spark):
    dirty, clean = _hot_corpus(spark, n_family=6)
    with pytest.raises(ValueError, match="hot_block_action"):
        blocked_levenshtein_link(dirty, clean, hot_block_action="explode")
    with pytest.raises(ValueError, match="max_dist <= 2"):
        blocked_levenshtein_link(
            dirty, clean, max_block=3, max_dist=3, hot_block_action="split"
        )
    # drop has no variant fan-out: any max_dist is allowed
    blocked_levenshtein_link(
        dirty, clean, max_block=3, max_dist=3, hot_block_action="drop"
    ).collect()


def test_sub_block_keys_exact_for_dist1_exhaustive(spark):
    """The max_dist=1 sub-key law behind the split action: EVERY pair
    within levenshtein 1 shares at least one sub-key (pigeonhole for
    long strings, deletion variants for short — including pairs that
    straddle the two families' length boundary)."""
    import itertools

    from pyspark_mrdf_spark.operators.linkage import _sub_block_keys

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    # all 'ab'-strings of lengths 1..7: dense in near-pairs at every
    # length parity and across the short/long key-family boundary
    words = ["".join(w) for n in range(1, 8) for w in itertools.product("ab", repeat=n)]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    kd = {
        r["s"]: set(r["v"])
        for r in df.select(
            "s", _sub_block_keys(F.col("s"), 1, is_dirty=True).alias("v")
        ).collect()
    }
    kc = {
        r["s"]: set(r["v"])
        for r in df.select(
            "s", _sub_block_keys(F.col("s"), 1, is_dirty=False).alias("v")
        ).collect()
    }
    missed = [
        (d, c)
        for d in words
        for c in words
        if lev(d, c) <= 1 and not (kd[d] & kc[c])
    ]
    assert missed == [], missed[:10]


def test_sub_block_keys_constant_fanout_for_long_names(spark):
    # the whole point vs full deletion neighborhoods: a 40-char member
    # of a whale block emits <= 6 keys, not ~41 variants
    from pyspark_mrdf_spark.operators.linkage import _sub_block_keys

    df = spark.createDataFrame([("x" * 40 + "abcdefgh",)], "s string")
    n_d = df.select(
        F.size(_sub_block_keys(F.col("s"), 1, is_dirty=True)).alias("n")
    ).collect()[0]["n"]
    n_c = df.select(
        F.size(_sub_block_keys(F.col("s"), 1, is_dirty=False)).alias("n")
    ).collect()[0]["n"]
    assert n_d <= 6, n_d
    assert n_c <= 2, n_c


def test_auto_dial_never_fires_on_oracle_corpus(spark, sf_dir):
    """The r14 auto-cap law the driver verdicts stand on: on the
    oracle corpora the part catalog's clean-side blocks top out at 8
    distinct names per key — far under AUTO_BLOCK_FLOOR — so
    max_block="auto" resolves to None and the plan IS the uncapped
    plan (q139/q153's oracles are provably unaffected by the new
    default)."""
    from pyspark_mrdf_spark.io import load_table
    from pyspark_mrdf_spark.operators.linkage import _resolve_auto_block

    p = load_table(spark, sf_dir, "part")
    c = p.select(F.col("p_name").alias("_cn")).distinct()
    ck = (
        c.select(
            "_cn",
            F.explode(
                F.array(
                    F.substring("_cn", 1, 3),
                    F.expr("substring(_cn, greatest(length(_cn) - 2, 1), 3)"),
                )
            ).alias("_k"),
        )
        .distinct()
    )
    assert _resolve_auto_block(ck) is None


def test_auto_dial_engages_on_whale_blocks_and_stays_lossless(spark):
    # mixed corpus: many cold 1-name blocks keep the median tiny, one
    # whale prefix family far above the floor — the auto cap must fire
    # (resolve to an int) and, because split is the action, results
    # must STILL equal the truly-uncapped run
    clean_names = [f"AAA-{i:04d}X" for i in range(150)] + [
        f"Q{i:03d}-cold-{i:03d}" for i in range(80)
    ]
    clean = spark.createDataFrame([(n,) for n in clean_names], "name string")
    dirty = spark.createDataFrame(
        [(i, f"AAA-{i:04d}") for i in range(0, 150, 3)],
        "rec_id long, name string",
    )
    from pyspark_mrdf_spark.operators.linkage import _resolve_auto_block

    ck = (
        clean.select(F.col("name").alias("_cn"))
        .distinct()
        .select(
            "_cn",
            F.explode(
                F.array(
                    F.substring("_cn", 1, 3),
                    F.expr("substring(_cn, greatest(length(_cn) - 2, 1), 3)"),
                )
            ).alias("_k"),
        )
        .distinct()
    )
    cap = _resolve_auto_block(ck)
    assert isinstance(cap, int) and cap >= 32
    auto = _rows(blocked_levenshtein_link(dirty, clean))  # default dial
    uncapped = _rows(blocked_levenshtein_link(dirty, clean, max_block=None))
    assert auto == uncapped and len(auto) == dirty.count()


def test_auto_dial_disengages_with_warning_at_deep_max_dist(spark):
    # max_dist=3: the lossless split is unavailable, so the DEFAULT
    # dial must fall back to uncapped with a warning — never a lossy
    # drop, never an error on default arguments
    import warnings as _w

    dirty, clean = _hot_corpus(spark, n_family=6)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        blocked_levenshtein_link(dirty, clean, max_dist=3).collect()
    assert any("auto' disengaged" in str(r.message) for r in rec)
