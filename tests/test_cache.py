"""Session materialization registry: keying and isolation.

The registry serves shared sub-results (exact/IVF/MRDF graphs, dedup
pair tables) across queries, so the one way it could corrupt results
is serving an entry across DIFFERENT keys — e.g. one scale factor's
table to another's query. These tests pin the boundary.
"""

from __future__ import annotations

from pyspark_mrdf_spark.cache import memoized_df


def test_same_key_serves_same_materialization(spark):
    calls = []

    def build():
        calls.append(1)
        return spark.range(5).toDF("id")

    a = memoized_df(spark, ("t", "k1"), build)
    b = memoized_df(spark, ("t", "k1"), build)
    assert a is b
    assert len(calls) == 1


def test_different_key_rebuilds(spark):
    a = memoized_df(spark, ("t", "k2"), lambda: spark.range(3).toDF("id"))
    b = memoized_df(spark, ("t", "k3"), lambda: spark.range(7).toDF("id"))
    assert a.count() == 3 and b.count() == 7


def test_sf_dirs_never_cross_serve(spark):
    # the real hazard: a query family memoizes per sf_dir while pytest
    # (sf0.001) and bench (sf0.1) share one session — each scale must
    # get its own materialization
    from pyspark_mrdf_spark.io import load_table

    counts = {}
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        df = memoized_df(
            spark,
            ("lineitem_count_probe", sf_dir),
            lambda d=sf_dir: load_table(spark, d, "lineitem"),
        )
        counts[sf_dir] = df.count()
    assert counts["/root/testdata/sf0.001"] != counts["/root/testdata/sf0.01"]
    for sf_dir, n in counts.items():
        assert n == load_table(spark, sf_dir, "lineitem").count()
