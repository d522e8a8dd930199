"""Relational operator family, demonstrated on the driver corpus.

Covers SURVEY.md §2B rows: scans/projection/filter, joins
(inner/left/semi/anti/broadcast), aggregations (sum/avg/min/max/
count-distinct, rollup), windows (rank/row_number/frames, top-k-per-key
— the reference's G1/O2 pattern, mrdf.py:166-170 / nndescent.py:184-189),
sorts/limits, relational set ops, scalar string/date/math/JSON
functions, and deterministic sampling.

Determinism contract with the DuckDB oracle: every floating aggregate
runs through exact DECIMAL intermediates and is cast to double only at
the end — Spark's partial-aggregation order can never perturb the
result, and both engines convert the same exact decimal to the same
double. No ROUND on decimals (exact .xx5 ties would expose
rounding-mode differences); doubles cast to decimal are never ties
(x.xx5 has no exact binary representation).

Scale notes (100 TB): filters/projections push to the parquet scan;
small dims (region/nation/supplier/part at TPC-H ratios) broadcast —
Spark's AQE picks broadcast automatically under the threshold, and the
flagship query marks them explicitly; the big fact-fact join
(orders⋈lineitem) hash-shuffles on the join key, which bucketing
co-locates in a real deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_mrdf_spark.io import load_table
from pyspark_mrdf_spark.queries import register

DEC = "decimal(18,2)"


def _dec(c):
    return F.col(c).cast(DEC)


def _t(spark, sf_dir, *names):
    """Load only the tables a query needs (column pruning starts with
    not scanning tables at all)."""
    return {n: load_table(spark, sf_dir, n) for n in names}


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-12-01'
GROUP BY l_returnflag, l_linestatus
""",
    description="TPC-H Q1-style pricing summary: filter + groupBy + decimal-exact sums/avgs",
    tags=("agg", "filter"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    charge = disc_price * (F.lit(1) + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_minmax_part",
    driver=False,  # pytest-only: min/max agg covered by q65 profile
    oracle="""
SELECT p_type,
       MIN(p_retailprice) AS min_price,
       MAX(p_retailprice) AS max_price,
       COUNT(DISTINCT p_brand) AS n_brands,
       COUNT(*) AS n_parts
FROM part
GROUP BY p_type
""",
    description="min/max/count-distinct aggregation",
    tags=("agg",),
)
def q02_minmax_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_type").agg(
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
        F.countDistinct("p_brand").alias("n_brands"),
        F.count(F.lit(1)).alias("n_parts"),
    )


@register(
    "q03_rollup_lineitem",
    driver=False,  # pytest-only: Expand-based agg covered by q67 grouping sets
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    description="ROLLUP hierarchical aggregation (Catalyst expand)",
    tags=("agg", "rollup"),
)
def q03_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------


@register(
    "q05_local_supplier_volume",
    driver=False,  # r9 rotation: 8x driver-green, cedes its slot to q119-q136 (relational keeps q01)
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    description="TPC-H Q5-style 6-way join: broadcast dims, shuffle fact-fact join",
    tags=("join", "agg", "broadcast"),
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders", "supplier", "customer", "nation", "region")
    # Dims are tiny at TPC-H ratios (region 5 rows, nation 25, supplier
    # 1e-5 of lineitem) — broadcast them so the only shuffle is the
    # orders⋈lineitem fact join on orderkey.
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"].filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        ), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"]),
              (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "q06_left_join_orders",
    driver=False,  # demoted r5 after 4 driver-green rounds; slot went to q42
    oracle="""
SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
""",
    description="left outer join preserving customers with zero orders",
    tags=("join",),
)
def q06_left_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast(DEC))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "q07_semi_join_urgent",
    driver=False,  # r8 fourth rotation: 7x driver-green (semi-join also exercised by q82's broadcast semi shape); cedes its slot to q111-q116
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
""",
    description="left-semi join (IN-subquery semantics)",
    tags=("join", "semi"),
)
def q07_semi_join_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "q08_anti_join_parts",
    driver=False,  # pytest-only: 0-row result is weak driver evidence; anti-join also proven by dedup_against/upsert tests. Slot given to q72 clustering.
    oracle="""
SELECT p_partkey, p_name FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
""",
    description="left-anti join: parts never ordered",
    tags=("join", "anti"),
)
def q08_anti_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "part", "lineitem")
    return (
        t["part"]
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
    )


@register(
    "q09_order_priority_check",
    driver=False,  # pytest-only: semi-join covered by q07
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    description="TPC-H Q4-style EXISTS via left-semi join",
    tags=("join", "semi", "agg"),
)
def q09_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    late = t["lineitem"]
    return (
        o.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Window / top-k family (reference G1/O2: top-k-by-key — mrdf.py:166-170)
# ---------------------------------------------------------------------------


@register(
    "q10_top_lineitems_per_order",
    driver=False,  # r7 rotation: 6x driver-green, cedes its slot to the new q87-q90 (family keeps q19 for windows; top-k-per-key also verified through q50/q80)
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice, rk FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) AS rk
  FROM lineitem) WHERE rk <= 2
""",
    description="top-k per key via row_number window (reference's G1/O2 merge pattern, mrdf.py:166-170)",
    tags=("window", "topk"),
)
def q10_top_lineitems_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(F.col("l_extendedprice").desc(), F.col("l_linenumber"))
    return (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "rk")
    )


@register(
    "q11_customer_rank_in_nation",
    driver=False,  # pytest-only: ranking window covered by q10 top-k
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_rank,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (
            PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_bal
FROM customer
""",
    description="rank + running-sum window frame",
    tags=("window",),
)
def q11_customer_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    wr = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    ws = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(wr).alias("bal_rank"),
        F.sum(_dec("c_acctbal")).over(ws).cast("double").alias("running_bal"),
    )


@register(
    "q12_top10_revenue_orders",
    driver=False,  # r8 fourth rotation: 7x driver-green (global sort/limit; distributed top-k stays verified via q88/q104's TakeOrdered plans); cedes its slot to q111-q116
    oracle="""
SELECT o_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    description="global sort + limit (TPC-H Q3 shape); unique tiebreak for determinism",
    tags=("sort", "limit", "join", "agg"),
)
def q12_top10_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        t["orders"]
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations (relational; reference E1-E3 are the array forms)
# ---------------------------------------------------------------------------


@register(
    "q13_setops_customers",
    driver=False,  # r7 rotation: 6x driver-green, cedes its slot to the new q87-q90 (family keeps q68 for set ops)
    oracle="""
SELECT c_custkey, 'both' AS tag FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O')
UNION ALL
SELECT c_custkey, 'only_building' AS tag FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O')
""",
    description="INTERSECT / EXCEPT / UNION ALL relational set ops",
    tags=("setop",),
)
def q13_setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    building = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    open_orders = (
        t["orders"].filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    )
    both = building.intersect(open_orders).withColumn("tag", F.lit("both"))
    only = building.exceptAll(open_orders.distinct()).distinct().withColumn("tag", F.lit("only_building"))
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# Scalar function family: string / date / math / JSON
# ---------------------------------------------------------------------------


@register(
    "q14_string_funcs",
    driver=False,  # rotated out r3: twice driver-green; slot ceded to q70-q80
    oracle="""
SELECT p_partkey,
       LOWER(p_name) AS lname,
       UPPER(p_brand) AS ubrand,
       SUBSTRING(p_type, 1, 3) AS type3,
       LENGTH(p_name) AS name_len,
       REPLACE(p_name, ' ', '_') AS snake,
       CONCAT(p_brand, ':', p_type) AS brand_type
FROM part WHERE p_name LIKE '%widget%'
""",
    description="string scalar functions + LIKE pushdown filter",
    tags=("scalar", "string"),
)
def q14_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%widget%")).select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.substring("p_type", 1, 3).alias("type3"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.concat_ws("", F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
    )


@register(
    "q15_date_funcs",
    driver=False,  # rotated out r3: twice driver-green; slot ceded to q70-q80
    oracle="""
SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(MONTH(o_orderdate) AS INT) AS o_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY 1, 2
""",
    description="date part extraction + aggregation",
    tags=("scalar", "date", "agg"),
)
def q15_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.month("o_orderdate").cast("int").alias("o_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
    )


@register(
    "q16_math_funcs",
    driver=False,  # rotated out r3: twice driver-green; slot ceded to q70-q80
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(l_discount - 0.05) AS disc_dev,
       CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_bucket,
       CAST(SQRT(l_quantity) AS DOUBLE) AS qty_sqrt,
       CAST(POWER(1 + l_tax, 2) AS DOUBLE) AS tax_sq,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod7
FROM lineitem WHERE l_orderkey % 100 = 0
""",
    description="math scalar functions over a deterministic modulo sample",
    tags=("scalar", "math"),
)
def q16_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_bucket"),
        F.sqrt("l_quantity").cast("double").alias("qty_sqrt"),
        F.pow(F.lit(1) + F.col("l_tax"), 2).cast("double").alias("tax_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
    )


@register(
    "q17_deterministic_sample",
    driver=False,  # rotated out r3: twice driver-green; slot ceded to q70-q80
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_orderkey % 10 = 3
""",
    description="deterministic 10% sample via key modulo (seeded-sampling capability, reference A1 utilities.py:15-30, made reproducible across engines)",
    tags=("sampling",),
)
def q17_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 10 == 3).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "q18_cube_agg",
    driver=False,  # pytest-only: Expand-based agg covered by q67 grouping sets
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    description="CUBE aggregation over both grouping dimensions (Catalyst expand, all 4 grouping sets)",
    tags=("agg", "cube"),
)
def q18_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q19_moving_avg",
    driver=False,  # r8 fourth rotation: 7x driver-green (windows keep q100/q114 partitioned-window driver reps); cedes its slot to q111-q116
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg,
       COUNT(*) OVER w AS n_in_frame
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
    description="moving average over a bounded ROWS window frame (per-customer order history)",
    tags=("window", "frame"),
)
def q19_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(_dec("o_totalprice")).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "moving_avg"
        ),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )


@register(
    "q26_pivot_priority",
    driver=False,  # rotated out r3: twice driver-green; slot ceded to q70-q80
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS high,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS other
FROM orders
GROUP BY o_orderstatus
""",
    description="pivot (long->wide conditional aggregation) of order value by priority class",
    tags=("agg", "pivot"),
)
def q26_pivot_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    price = _dec("o_totalprice")
    zero = F.lit(0).cast(DEC)
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", price).otherwise(zero))
        .cast("double")
        .alias("urgent"),
        F.sum(F.when(F.col("o_orderpriority") == "2-HIGH", price).otherwise(zero))
        .cast("double")
        .alias("high"),
        F.sum(
            F.when(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), price).otherwise(zero)
        )
        .cast("double")
        .alias("other"),
    )


@register(
    "q27_above_customer_avg",
    driver=False,  # r7 rotation: 6x driver-green, cedes its slot to the new q87-q90 (family keeps q05/q07/q28/q29/q76 for joins)
    oracle="""
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
JOIN (SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
      FROM orders GROUP BY o_custkey) a
  ON o.o_custkey = a.o_custkey
WHERE o.o_totalprice > a.avg_price
""",
    description="correlated-subquery semantics (orders above their customer's average) via self-agg join",
    tags=("join", "subquery"),
)
def q27_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    avg = o.groupBy("o_custkey").agg(
        (F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("avg_price")
    )
    return (
        o.join(avg, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q38_disjunctive_predicates",
    driver=False,  # pytest-only: OR-pushdown evidenced in EXPLAIN.md; scan+filter covered by q01/q14
    oracle="""
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#3' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#5' AND p_size <= 30 AND l_quantity BETWEEN 20 AND 50)
""",
    description="TPC-H Q19-style disjunctive multi-table predicates: Catalyst splits the OR into join-level filters + pushes the common conjuncts",
    tags=("join", "filter"),
)
def q38_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")
    li, part = t["lineitem"], t["part"]
    j = li.join(part, li["l_partkey"] == part["p_partkey"])
    b = F.col("p_brand")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((b == "Brand#1") & (sz <= 10) & q.between(1, 15))
        | ((b == "Brand#3") & (sz <= 20) & q.between(10, 30))
        | ((b == "Brand#5") & (sz <= 30) & q.between(20, 50))
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rev).cast("double").alias("revenue"),
    )


@register(
    "q39_median_order_value",
    driver=False,  # rotated out r3: twice driver-green; slot ceded to q70-q80
    oracle="""
WITH ranked AS (
  SELECT o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders)
SELECT o_orderstatus, o_totalprice AS median_price
FROM ranked WHERE rn = (n + 1) // 2
""",
    description="exact median via order statistics (deterministic lower median — no interpolation, so both engines pick the identical row)",
    tags=("window", "agg", "percentile"),
)
def q39_median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderstatus")
    return (
        o.select(
            "o_orderstatus",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        .filter(F.col("rn") == ((F.col("n") + 1) / 2).cast("bigint"))
        .select("o_orderstatus", F.col("o_totalprice").alias("median_price"))
    )


@register(
    "q65_profile_lineitem",
    driver=False,  # r7 rotation: 6x driver-green, cedes its slot to the new q87-q90 (family keeps q01/q67 for aggregations)
    oracle="""
SELECT 'l_quantity' AS col_name, COUNT(*) AS n,
       COUNT(*) - COUNT(l_quantity) AS n_nulls,
       COUNT(DISTINCT l_quantity) AS n_distinct,
       MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
       COUNT(DISTINCT l_extendedprice), MIN(l_extendedprice), MAX(l_extendedprice)
FROM lineitem
UNION ALL
SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
       COUNT(DISTINCT l_discount), MIN(l_discount), MAX(l_discount)
FROM lineitem
""",
    description="column-profiling operator (n/nulls/distinct/min/max per column): the data-QA pass every ingest runs; one scan, Catalyst fuses the aggregates",
    tags=("agg", "profiling"),
)
def q65_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def prof(c: str):
        return li.agg(
            F.lit(c).alias("col_name"),
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).alias("min_v"),
            F.max(c).alias("max_v"),
        )

    out = prof("l_quantity")
    for c in ("l_extendedprice", "l_discount"):
        out = out.unionByName(prof(c))
    return out


@register(
    "q67_grouping_sets",
    driver=False,  # r9 rotation: 8x driver-green, cedes its slot to q119-q136 (aggregations keep q01)
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    description="explicit GROUPING SETS with grouping_id disambiguation (the general form of rollup/cube; one Expand, one aggregate)",
    tags=("agg", "grouping-sets"),
)
def q67_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total"),
    )


@register(
    "q68_array_set_ops",
    driver=False,  # r8 third rotation: multi-round green (E1-E4 reps); cedes to q105-q110
    oracle="""
WITH per_user AS (
  SELECT user_id,
         COALESCE(list_sort(list(DISTINCT event_type) FILTER (WHERE value >= 50)),
                  CAST([] AS VARCHAR[])) AS hi_types,
         list_sort(list(DISTINCT event_type)) AS all_types
  FROM events GROUP BY user_id)
SELECT user_id,
       COALESCE(array_to_string(list_sort(list_filter(all_types, t -> NOT list_contains(hi_types, t))), ','),
                '') AS low_only_types,
       len(hi_types) AS n_hi,
       len(all_types) AS n_all
FROM per_user
""",
    description="array set operations on aggregated sets (collect_set -> array_sort/array_except): the reference's E1-E3 family at column level",
    tags=("array", "agg", "events"),
)
def q68_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hi = F.array_sort(
        F.collect_set(F.when(F.col("value") >= 50, F.col("event_type")))
    )
    allt = F.array_sort(F.collect_set("event_type"))
    per_user = ev.groupBy("user_id").agg(hi.alias("hi_types"), allt.alias("all_types"))
    # low_only_types serialized to a csv string (driver canonicalizer
    # hashes scalar cells only); sizes cast to bigint to match DuckDB len.
    return per_user.select(
        "user_id",
        F.array_join(
            F.array_sort(F.array_except("all_types", "hi_types")), ","
        ).alias("low_only_types"),
        F.size("hi_types").cast("bigint").alias("n_hi"),
        F.size("all_types").cast("bigint").alias("n_all"),
    )


@register(
    "q75_unpivot_lineitem",
    driver=False,  # r8 rotation: 5x driver-green, cedes its slot to q91-q98 (Expand op pytest-covered; aggs keep q01/q67)
    # promoted r3: rotated into the driver surface for a hard verdict
    oracle="""
SELECT l_orderkey, l_linenumber, metric,
       CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem)
WHERE l_orderkey <= 64
""",
    description="UNPIVOT/melt (wide metrics -> long rows): Catalyst Expand, the inverse of q26's pivot",
    tags=("reshape", "unpivot"),
)
def q75_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 64)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "value",
    ).withColumn("value", F.col("value").cast(DEC).cast("double"))


# --- q139: fuzzy record linkage (blocking + levenshtein) ---------------------
#
# Entity resolution across feeds: a "dirty" snapshot of part names (one
# deterministic character deletion each, position = partkey % length, so
# both engines derive bit-identical corruptions) linked back to the
# clean catalog through operators/linkage.py — prefix/suffix blocking
# equi-joins, JVM levenshtein on candidates only, per-record (dist,
# name) argmin. The oracle replays corruption, blocks, distance, and
# tie-break identically.


@register(
    "q139_fuzzy_record_linkage",
    driver=False,  # r13 rotation: 3x driver-green (r10-r12), cedes its slot to q160 (its superset: same chain + hot-block split)
    oracle="""
WITH clean AS (SELECT DISTINCT p_name AS cn FROM part),
dirty AS (
  SELECT p_partkey AS rec_id,
         concat(substring(p_name, 1, CAST(p_partkey % length(p_name) AS INTEGER)),
                substring(p_name, CAST(p_partkey % length(p_name) AS INTEGER) + 2)) AS dn
  FROM part WHERE p_partkey % 3 = 1),
dk AS (
  SELECT rec_id, dn, substring(dn, 1, 3) AS k FROM dirty
  UNION
  SELECT rec_id, dn, substring(dn, greatest(length(dn) - 2, 1), 3) AS k FROM dirty),
ck AS (
  SELECT DISTINCT cn, k FROM (
    SELECT cn, substring(cn, 1, 3) AS k FROM clean
    UNION
    SELECT cn, substring(cn, greatest(length(cn) - 2, 1), 3) AS k FROM clean)),
scored AS (
  SELECT DISTINCT rec_id, dn, cn FROM dk JOIN ck USING (k)),
best AS (
  SELECT rec_id, dn, cn, levenshtein(dn, cn) AS dist,
         ROW_NUMBER() OVER (
           PARTITION BY rec_id ORDER BY levenshtein(dn, cn), cn) AS r
  FROM scored WHERE levenshtein(dn, cn) <= 1)
SELECT rec_id, dn AS name, cn AS matched_name, CAST(dist AS INTEGER) AS dist
FROM best WHERE r = 1
""",
    description=(
        "fuzzy record linkage: deterministic single-char-deletion dirty "
        "feed linked to the clean part catalog via prefix/suffix "
        "blocking + levenshtein<=1 + per-record (dist, name) argmin"
    ),
    tags=("linkage", "join", "text"),
)
def q139_fuzzy_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best clean-name match for each corrupted part name.

    Scale shape: blocking equi-joins on 3-char keys bound the distance
    computation to candidate pairs; the argmin window partitions by
    dirty record id (no hot partitions). An all-pairs levenshtein
    never appears in the plan."""
    from pyspark_mrdf_spark.operators.linkage import blocked_levenshtein_link

    p = load_table(spark, sf_dir, "part")
    corrupt = (
        "concat(substring(p_name, 1, cast(p_partkey % length(p_name) as int)), "
        "substring(p_name, cast(p_partkey % length(p_name) as int) + 2))"
    )
    dirty = p.filter(F.col("p_partkey") % 3 == 1).select(
        F.col("p_partkey").alias("rec_id"), F.expr(corrupt).alias("name")
    )
    clean = p.select("p_name")
    return blocked_levenshtein_link(
        dirty, clean, id_col="rec_id", name_col="name", clean_name_col="p_name"
    )


# --- q153: multi-source golden record ----------------------------------------
#
# The step after q139: two independently-corrupted feeds link back to
# the catalog, and the per-entity rollup (coverage per feed, first
# observed record) is the "golden record" master-data table. The
# oracle replays BOTH linkages and the rollup — mechanical but long,
# which is exactly why the engine-side composition matters.


def _q153_linkage_cte(feed_mod: int, pos_mul: int, tag: str) -> str:
    """One feed's corruption + blocking + argmin as SQL CTEs (the q139
    chain, parameterized by feed)."""
    return f"""
dirty_{tag} AS (
  SELECT p_partkey AS rec_id,
         concat(substring(p_name, 1, CAST(({pos_mul} * p_partkey) % length(p_name) AS INTEGER)),
                substring(p_name, CAST(({pos_mul} * p_partkey) % length(p_name) AS INTEGER) + 2)) AS dn
  FROM part WHERE p_partkey % {feed_mod} = {feed_mod - 1}),
dk_{tag} AS (
  SELECT rec_id, dn, substring(dn, 1, 3) AS k FROM dirty_{tag}
  UNION
  SELECT rec_id, dn, substring(dn, greatest(length(dn) - 2, 1), 3) AS k FROM dirty_{tag}),
scored_{tag} AS (
  SELECT DISTINCT rec_id, dn, cn FROM dk_{tag} JOIN ck USING (k)),
best_{tag} AS (
  SELECT rec_id, cn FROM (
    SELECT rec_id, cn, ROW_NUMBER() OVER (
      PARTITION BY rec_id ORDER BY levenshtein(dn, cn), cn) AS r
    FROM scored_{tag} WHERE levenshtein(dn, cn) <= 1)
  WHERE r = 1)"""


@register(
    "q153_golden_record",
    driver=True,  # promoted r10: owed rotation for the r9-registered operators
    oracle=f"""
WITH clean AS (SELECT DISTINCT p_name AS cn FROM part),
ck AS (
  SELECT DISTINCT cn, k FROM (
    SELECT cn, substring(cn, 1, 3) AS k FROM clean
    UNION
    SELECT cn, substring(cn, greatest(length(cn) - 2, 1), 3) AS k FROM clean)),
{_q153_linkage_cte(3, 1, "a")},
{_q153_linkage_cte(5, 7, "b")}
SELECT cn AS entity_name,
       CAST(COALESCE(na, 0) AS BIGINT) AS n_feed_a,
       CAST(COALESCE(nb, 0) AS BIGINT) AS n_feed_b,
       CAST(LEAST(COALESCE(ra, 9223372036854775807),
                  COALESCE(rb, 9223372036854775807)) AS BIGINT) AS first_rec_id
FROM (
  SELECT COALESCE(a.cn, b.cn) AS cn, a.na, a.ra, b.nb, b.rb
  FROM (SELECT cn, COUNT(*) AS na, MIN(rec_id) AS ra FROM best_a GROUP BY cn) a
  FULL OUTER JOIN
       (SELECT cn, COUNT(*) AS nb, MIN(rec_id) AS rb FROM best_b GROUP BY cn) b
  ON a.cn = b.cn)
""",
    description=(
        "multi-source golden record: two independently-corrupted feeds "
        "linked to the catalog (q139's blocking+levenshtein chain twice), "
        "consolidated per entity with per-feed coverage + first observed "
        "record id"
    ),
    tags=("linkage", "join", "agg"),
)
def q153_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity master table from two dirty feeds.

    Scale shape: two q139-shaped linkages (blocking equi-joins +
    candidate-bounded levenshtein + per-record argmin) whose outputs
    are entity-keyed aggregates, consolidated by one full-outer
    equi-join on the entity name."""
    from pyspark_mrdf_spark.operators.linkage import blocked_levenshtein_link

    p = load_table(spark, sf_dir, "part")
    clean = p.select("p_name")

    def feed(mod: int, mul: int) -> DataFrame:
        corrupt = (
            f"concat(substring(p_name, 1, cast(({mul} * p_partkey) % length(p_name) as int)), "
            f"substring(p_name, cast(({mul} * p_partkey) % length(p_name) as int) + 2))"
        )
        return p.filter(F.col("p_partkey") % mod == mod - 1).select(
            F.col("p_partkey").alias("rec_id"), F.expr(corrupt).alias("name")
        )

    def side(df: DataFrame, n_col: str, r_col: str) -> DataFrame:
        return (
            blocked_levenshtein_link(df, clean, clean_name_col="p_name")
            .groupBy("matched_name")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias(n_col),
                F.min("rec_id").alias(r_col),
            )
        )

    a = side(feed(3, 1), "n_feed_a", "ra")
    b = side(feed(5, 7), "n_feed_b", "rb")
    big = F.lit(9223372036854775807)
    return (
        a.join(b, "matched_name", "full_outer")
        .select(
            F.col("matched_name").alias("entity_name"),
            F.coalesce(F.col("n_feed_a"), F.lit(0)).cast("bigint").alias("n_feed_a"),
            F.coalesce(F.col("n_feed_b"), F.lit(0)).cast("bigint").alias("n_feed_b"),
            F.least(
                F.coalesce(F.col("ra"), big), F.coalesce(F.col("rb"), big)
            ).cast("bigint").alias("first_rec_id"),
        )
    )


# --- q160: hot-block SPLIT linkage -------------------------------------------
#
# The r13 hot-block bound (operators/linkage.py hot_block_action=
# 'split'): oversized blocks re-block on exact sub-keys (2-segment
# pigeonhole / deletion neighborhoods) instead of dropping the key.
# The exactness LAW — splitting loses nothing — lets the oracle be the
# plain UNCAPPED blocking chain (q139's SQL with a different feed):
# the engine runs the full hot-detection + sub-key machinery with a
# max_block low enough that the shared-first-word prefix blocks of
# p_name are genuinely hot at every sf, and the hash verdict IS the
# law on real data.


@register(
    "q160_linkage_hot_split",
    # promoted r13 at registration: the 3x-green q139 cedes its slot
    # (see tests/test_oracle_queries.py DRIVER_SURFACE) — q160 is its
    # superset (same chain + the hot-block split machinery)
    oracle="""
WITH clean AS (SELECT DISTINCT p_name AS cn FROM part),
dirty AS (
  SELECT p_partkey AS rec_id,
         concat(substring(p_name, 1, CAST((3 * p_partkey) % length(p_name) AS INTEGER)),
                substring(p_name, CAST((3 * p_partkey) % length(p_name) AS INTEGER) + 2)) AS dn
  FROM part WHERE p_partkey % 4 = 2),
dk AS (
  SELECT rec_id, dn, substring(dn, 1, 3) AS k FROM dirty
  UNION
  SELECT rec_id, dn, substring(dn, greatest(length(dn) - 2, 1), 3) AS k FROM dirty),
ck AS (
  SELECT DISTINCT cn, k FROM (
    SELECT cn, substring(cn, 1, 3) AS k FROM clean
    UNION
    SELECT cn, substring(cn, greatest(length(cn) - 2, 1), 3) AS k FROM clean)),
scored AS (
  SELECT DISTINCT rec_id, dn, cn FROM dk JOIN ck USING (k)),
best AS (
  SELECT rec_id, dn, cn, levenshtein(dn, cn) AS dist,
         ROW_NUMBER() OVER (
           PARTITION BY rec_id ORDER BY levenshtein(dn, cn), cn) AS r
  FROM scored WHERE levenshtein(dn, cn) <= 1)
SELECT rec_id, dn AS name, cn AS matched_name, CAST(dist AS INTEGER) AS dist
FROM best WHERE r = 1
""",
    description=(
        "hot-block SPLIT record linkage (operators/linkage.py r13): "
        "block keys whose clean-side frequency exceeds max_block=8 — "
        "at every sf that includes the shared-first-word p_name prefix "
        "blocks — are re-blocked on exact sub-keys (2-segment "
        "pigeonhole; deletion neighborhoods for short strings) instead "
        "of dropped. The oracle replays the UNCAPPED chain: hash "
        "equality is the exactness law (split loses nothing) verified "
        "on real data, where the r12 stoplist measured 0.873 agreement "
        "at 30x"
    ),
    tags=("linkage", "join", "text"),
)
def q160_linkage_hot_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q139's chain with a deliberately hot dial: max_block=8 makes
    every first-word prefix block oversized, so most candidates route
    through the split sub-keys — and the result must still equal the
    uncapped chain exactly.

    Scale shape: hot members emit <= 6 SHORT segment keys each (not
    O(len) deletion variants), the sub-block join is an equi-join on
    (key, sub-key), and sub-block sizes track match density — the 30x
    probe measures the wall next to the lossy 'drop' dial."""
    from pyspark_mrdf_spark.operators.linkage import blocked_levenshtein_link

    p = load_table(spark, sf_dir, "part")
    corrupt = (
        "concat(substring(p_name, 1, cast((3 * p_partkey) % length(p_name) as int)), "
        "substring(p_name, cast((3 * p_partkey) % length(p_name) as int) + 2))"
    )
    dirty = p.filter(F.col("p_partkey") % 4 == 2).select(
        F.col("p_partkey").alias("rec_id"), F.expr(corrupt).alias("name")
    )
    return blocked_levenshtein_link(
        dirty, p.select("p_name"), id_col="rec_id", name_col="name",
        clean_name_col="p_name", max_block=8, hot_block_action="split",
    )
