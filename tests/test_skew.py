"""salted_join: exact equivalence with the plain join, and the shuffle
really happens on (key, salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_mrdf_spark.io import load_table
from pyspark_mrdf_spark.operators.skew import salted_join


def test_salted_join_matches_plain(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    c = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    plain = o.join(c, "custkey").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s")
    ).collect()[0]
    salted = salted_join(o, c, "custkey", n_salts=4).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s")
    ).collect()[0]
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_salted_join_shuffles_on_salt(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    c = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            salted_join(o, c, "custkey", n_salts=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "custkey" in plan and "_salt" in plan
        assert "hashpartitioning(custkey" in plan and "_salt" in plan.split("hashpartitioning(custkey", 1)[1][:60]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
