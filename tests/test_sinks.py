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


def test_zorder_layout_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Measured data skipping: footer min/max of the z-ordered files
    must let a range predicate on EITHER clustered column prune most
    files, where a single-column sort layout skips only on its sort
    column. Counted from the actual written parquet footers."""
    import glob

    import pyarrow.parquet as pq

    from pyspark_mrdf_spark.io import load_table, write_zordered

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    n_files = 16
    zpath = str(tmp_path / "li_zorder")
    spath = str(tmp_path / "li_sorted")
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"], target_files=n_files)
    (
        li.repartitionByRange(n_files, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def overlap_fraction(path, col, lo, hi):
        files = sorted(glob.glob(path + "/part-*.parquet"))
        assert files
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
            assert fmin is not None, f"no stats for {col} in {f}"
            if not (fmax < lo or fmin > hi):
                hit += 1
        return hit / len(files)

    bounds = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).collect()[0]
    ok_lo, ok_hi = bounds[0], bounds[1]
    pk_lo, pk_hi = bounds[2], bounds[3]

    def mid_range(lo, hi, frac=0.05):
        # probe at 30% of the span: a range straddling the 50% point
        # sits exactly on the top-level Z-curve quadrant boundary and
        # legitimately touches both halves — the measurement should
        # probe a generic range, not the worst-aligned one
        span = hi - lo
        a = lo + int(0.3 * span)
        return a, a + max(1, int(frac * span))

    o_a, o_b = mid_range(ok_lo, ok_hi)
    p_a, p_b = mid_range(pk_lo, pk_hi)

    # sorted-by-orderkey layout: skips on orderkey, blind on partkey
    assert overlap_fraction(spath, "l_orderkey", o_a, o_b) <= 0.25
    assert overlap_fraction(spath, "l_partkey", p_a, p_b) >= 0.9

    # z-order: must skip meaningfully on BOTH dimensions
    z_ok = overlap_fraction(zpath, "l_orderkey", o_a, o_b)
    z_pk = overlap_fraction(zpath, "l_partkey", p_a, p_b)
    assert z_ok <= 0.6, z_ok
    assert z_pk <= 0.6, z_pk

    # and the layout change must not change the data
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    assert back.agg(F.sum("l_partkey")).collect()[0][0] == li.agg(
        F.sum("l_partkey")
    ).collect()[0][0]


def test_zorder_key_matches_python_reference(spark):
    from pyspark_mrdf_spark.io import zorder_key

    import pytest

    bits = 8
    rows = [(x, y, z) for x in (0, 3, 7, 255) for y in (0, 128, 255) for z in (5, 250)]
    df = spark.createDataFrame(rows, ["x", "y", "z"])
    got = [
        r["k"]
        for r in df.select(
            zorder_key(["x", "y", "z"], [0, 0, 0], [255, 255, 255], bits=bits).alias("k")
        ).collect()
    ]

    def ref(vals):
        # same equi-width binning (span 255, 2^8 bins, clamped) + interleave
        key = 0
        binned = [min(max(int(v * (2**bits) / 255.0), 0), 2**bits - 1) for v in vals]
        for i in range(bits):
            for j, b in enumerate(binned):
                key |= ((b >> i) & 1) << (i * 3 + j)
        return key

    assert got == [ref(r) for r in rows]
    # degenerate column (span 0) contributes a constant 0 plane
    one = spark.createDataFrame([(9, 1), (9, 2)], ["a", "b"])
    ks = [
        r["k"]
        for r in one.select(
            zorder_key(["a", "b"], [9, 0], [9, 3], bits=4).alias("k")
        ).collect()
    ]
    assert len(set(ks)) == 2  # b still discriminates
    # int64 budget enforced
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], [0, 0], [1, 1], bits=32)
