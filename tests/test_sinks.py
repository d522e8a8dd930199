"""Sink-side scale mechanics: partition pruning on partitioned writes,
shuffle elimination on bucketed joins — asserted on the PLAN, not just
the results, because the plan is the scale contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_mrdf_spark.io import load_table, write_bucketed, write_partitioned


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("part_orders"))
    o = load_table(spark, sf_dir, "orders")
    write_partitioned(o, d, ["o_orderstatus"])
    back = spark.read.parquet(d).filter(F.col("o_orderstatus") == "F")
    plan = _plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]
    expected = o.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bucketed"))
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "orders_b", os.path.join(base, "o"), ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"])
    write_bucketed(li, "lineitem_b", os.path.join(base, "l"), ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _plan(joined)
        # both sides arrive pre-distributed: no shuffle Exchange at all
        assert "Exchange hashpartitioning" not in plan, plan
        n = joined.count()
        expected = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).count()
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
