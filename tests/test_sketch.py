"""operators/sketch.py: the bounded-shuffle heavy-hitter tier must be
EXACTLY the full groupBy, for any partitioning and any m >= k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_mrdf_spark.operators.sketch import heavy_hitters


def _zipfish(spark, n=5000, seed=7):
    # deterministic skewed stream: key = id % (id % 97 + 1) folds mass
    # onto small keys; a handful of keys cross the 2% bar, a long tail
    # of ~97 distinct keys does not
    return spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % (F.col("id") % 97 + 1)))
        .alias("token")
    )


def _exact(df, k):
    total = df.count()
    return {
        (r["token"], r["cnt"])
        for r in df.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > total)
        .collect()
    }


@pytest.mark.parametrize("parts", [1, 3, 17])
def test_heavy_hitters_equals_groupby(spark, parts):
    df = _zipfish(spark).repartition(parts)
    k = 50
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(df, "token", k).collect()}
    assert got == _exact(df, k)
    assert got  # the skewed stream must actually produce heavy hitters


def test_heavy_hitters_minimal_m(spark):
    # m = k is the edge of the superset guarantee and must still be exact
    df = _zipfish(spark, n=2000).repartition(5)
    k = 20
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(df, "token", k, m=k).collect()}
    assert got == _exact(df, k)


def test_heavy_hitters_m_below_k_rejected(spark):
    df = _zipfish(spark, n=100)
    with pytest.raises(ValueError):
        heavy_hitters(df, "token", 10, m=9)
