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


def test_simhash_banding_no_false_negatives(spark, sf_dir):
    from pyspark_mrdf_spark.operators.dedup import simhash, simhash_band_candidates
    from pyspark.sql import functions as F
    from pyspark_mrdf_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    sh = simhash(d, bits=16).localCheckpoint()
    # exact pairs with hamming <= bands-1 = 2
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    close = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("h", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("h") <= 2)
        .select("doc_a", "doc_b")
    )
    cand = simhash_band_candidates(sh, bands=3, bits=16)
    missed = close.join(cand, ["doc_a", "doc_b"], "left_anti").count()
    assert missed == 0
    # and banding actually prunes: candidates << all pairs
    n = sh.count()
    assert cand.count() < n * (n - 1) / 2


def test_jaccard_max_df_is_candidate_subset(spark, sf_dir):
    from pyspark_mrdf_spark.operators.dedup import jaccard_pairs
    from pyspark_mrdf_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(200)
    full = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in jaccard_pairs(d).collect()}
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(d, max_df=20).collect()
    }
    assert set(capped) <= set(full)
    for pair, j in capped.items():
        assert j <= full[pair] + 1e-12  # strict under-estimate


def test_salted_join_rejects_right_full(spark, sf_dir):
    import pytest
    from pyspark_mrdf_spark.io import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(o, c, "custkey", n_salts=4, how=how)


def test_key_skew_profile_buckets_and_nulls(spark):
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.skew import key_skew_profile

    # 1 key with 8 rows (bucket 3), 2 keys with 3 rows (bucket 1),
    # 4 keys with 1 row (bucket 0), 5 NULL rows (bucket -1)
    rows = (
        [("hot",)] * 8
        + [("a",)] * 3
        + [("b",)] * 3
        + [(k,) for k in ("c", "d", "e", "f")]
        + [(None,)] * 5
    )
    df = spark.createDataFrame(rows, ["k"]).repartition(6)
    got = {
        r["log2_bucket"]: (r["n_keys"], r["n_rows"], r["max_key_rows"])
        for r in key_skew_profile(df, "k").collect()
    }
    assert got == {
        3: (1, 8, 8),
        1: (2, 6, 3),
        0: (4, 4, 1),
        -1: (1, 5, 5),
    }
