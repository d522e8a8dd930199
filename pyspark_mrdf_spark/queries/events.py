"""Event-stream query family over the ``events`` table.

Batch queries shaped for Structured Streaming: tumbling event-time
windows (``date_trunc``), JSON property extraction
(``get_json_object``), and sequence analytics (lag). The same
transformations run under ``readStream`` with a watermark — see
``pyspark_mrdf_spark.streaming``.

Float discipline: ``value`` is double; aggregates go through
DECIMAL(18,6) so Spark's partial-agg order can't perturb results
(see relational.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_mrdf_spark.io import load_table
from pyspark_mrdf_spark.queries import register

DEC6 = "decimal(18,6)"


@register(
    "q20_json_props",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DECIMAL(18,6))) AS DOUBLE) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
""",
    description="JSON property extraction (get_json_object on events.props) + aggregation",
    tags=("json", "agg", "events"),
)
def q20_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k.cast(DEC6)).cast("double").alias("sum_k"),
        F.max(k).cast("int").alias("max_k"),
    )


@register(
    "q21_hourly_windows",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
""",
    description="tumbling event-time window aggregation (streaming-ready shape)",
    tags=("window-agg", "events", "streaming"),
)
def q21_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC6)).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "q22_event_gaps",
    oracle="""
SELECT event_id, user_id, ts,
       date_diff('microsecond',
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 ts) AS gap_us
FROM events
""",
    description="per-user inter-event gap via lag window (sessionization building block)",
    tags=("window", "events"),
)
def q22_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev)).alias("gap_us"),
    )


@register(
    "q24_session_windows",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_sess
  FROM events),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)
SELECT MIN(ts) AS session_start, user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
FROM sess GROUP BY user_id, sid
""",
    description="per-user session windows (session_window, gap=30m) vs SQL gaps-and-islands oracle; same fn runs under readStream+watermark",
    tags=("window-agg", "events", "streaming", "session"),
)
def q24_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_mrdf_spark.streaming.windows import session_windows

    return session_windows(load_table(spark, sf_dir, "events"), gap="30 minutes")


@register(
    "q25_sliding_windows",
    oracle="""
SELECT window_start, event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value,
       COUNT(*) AS n_events
FROM (SELECT unnest([date_trunc('hour', ts) - INTERVAL '1 hour',
                     date_trunc('hour', ts)]) AS window_start,
             event_type, value
      FROM events)
GROUP BY 1, 2
""",
    description="sliding 2h/1h event-time windows (each event in 2 windows) vs unnest-expansion oracle; streaming-ready shape",
    tags=("window-agg", "events", "streaming", "sliding"),
)
def q25_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_mrdf_spark.streaming.windows import sliding_value_avg

    return sliding_value_avg(load_table(spark, sf_dir, "events"))


@register(
    "q23_user_activity",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts,
       SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchases
FROM events
GROUP BY user_id
""",
    description="per-user activity summary: conditional aggregation + min/max timestamps",
    tags=("agg", "events"),
)
def q23_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchases"),
    )


@register(
    "q28_asof_prev_click",
    oracle="""
SELECT l.event_id, l.user_id, l.ts, r.ts AS asof_ts, r.value AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""",
    description="as-of join (most recent prior click per purchase): union + carry-forward window, one shuffle, vs DuckDB native ASOF JOIN",
    tags=("events", "asof", "join"),
)
def q28_asof_prev_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_mrdf_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    return asof_join(purchases, clicks, "user_id").select(
        "event_id", "user_id", "ts", "asof_ts", "asof_value"
    )


@register(
    "q29_price_band_join",
    oracle="""
SELECT band_id,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
FROM part
JOIN (SELECT i AS band_id, 900 + i * 20 AS lo, 900 + (i + 1) * 20 AS hi
      FROM generate_series(0, 4) t(i)) bands
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band_id
""",
    description="range (interval containment) join against a broadcast band table + per-band aggregate",
    tags=("join", "range"),
)
def q29_price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_mrdf_spark.operators.temporal import band_join

    part = load_table(spark, sf_dir, "part")
    bands = spark.range(5).select(
        F.col("id").alias("band_id"),
        (900 + F.col("id") * 20).cast("double").alias("lo"),
        (900 + (F.col("id") + 1) * 20).cast("double").alias("hi"),
    )
    return (
        band_join(part, bands, "p_retailprice")
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (
                F.sum(F.col("p_retailprice").cast(DEC6)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_price"),
        )
    )


@register(
    "q63_stream_stream_join",
    oracle="""
SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts, c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '1 hour'
""",
    description="stream-stream join shape (purchase x clicks within preceding hour): event-time range bound = bounded state under watermarks",
    tags=("events", "streaming", "join"),
)
def q63_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_mrdf_spark.streaming.joins import purchases_with_recent_clicks

    return purchases_with_recent_clicks(load_table(spark, sf_dir, "events"))


@register(
    "q66_variant_props",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50 THEN 1 END) AS BIGINT) AS n_high
FROM events
GROUP BY event_type
""",
    description="semi-structured props via Spark 4 VariantType (parse_json + try_variant_get): the shredded-JSON path, vs string get_json_object in q20",
    tags=("json", "variant", "events"),
)
def q66_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import parse_json, try_variant_get

    ev = load_table(spark, sf_dir, "events")
    k = try_variant_get(parse_json(F.col("props")), "$.k", "int")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.sum("k").cast("bigint").alias("sum_k"),
        F.count(F.when(F.col("k") > 50, 1)).cast("bigint").alias("n_high"),
    )
