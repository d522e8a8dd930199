"""Event-stream query family over the ``events`` table.

Batch queries shaped for Structured Streaming: tumbling event-time
windows (``date_trunc``), JSON property extraction
(``get_json_object``), and sequence analytics (lag). The same
transformations run under ``readStream`` with a watermark — see
``pyspark_mrdf_spark.streaming``.

Float discipline: ``value`` is double; aggregates go through
DECIMAL(18,6) so Spark's partial-agg order can't perturb results
(see relational.py docstring).

Timestamp discipline: driver-facing outputs serialize event-time
columns as epoch MICROSECONDS (bigint) — ``unix_micros`` on the Spark
side, ``epoch_us`` in the DuckDB oracle. The driver's canonicalizer
hashes pandas values dtype-sensitively and its collection path
(collect vs Arrow, ns vs us datetime unit) is not ours to control;
int64 microseconds are representation-proof on both engines. The
streaming twins (``pyspark_mrdf_spark.streaming``) keep real
timestamps — watermarks and windows need them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_mrdf_spark.io import load_table
from pyspark_mrdf_spark.queries import register

DEC6 = "decimal(18,6)"


@register(
    "q20_json_props",
    driver=False,  # rotated out r3: twice driver-green; slot ceded to q70-q80
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
    driver=False,  # demoted r7 after 6 driver-green rounds; slot went to q86 embed->knn
    oracle="""
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
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
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("window_start_us"),
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
    driver=False,  # r8 third rotation: green r5-r7, cedes its slot to q105-q110
    # promoted r5: rotated into the driver surface for a hard verdict
    # (took q23's slot — q23 was driver-green rounds 1-4)
    oracle="""
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
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
        F.unix_micros(F.col("ts")).alias("ts_us"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev)).alias("gap_us"),
    )


@register(
    "q24_session_windows",
    driver=False,  # r8 rotation: 7x driver-green, cedes its slot to q99-q104 (windows keep q25 sliding + q19 moving-avg driver reps)
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
SELECT epoch_us(MIN(ts)) AS session_start_us, user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
FROM sess GROUP BY user_id, sid
""",
    description="per-user session windows (session_window, gap=30m) vs SQL gaps-and-islands oracle; same fn runs under readStream+watermark",
    tags=("window-agg", "events", "streaming", "session"),
)
def q24_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_mrdf_spark.streaming.windows import session_windows

    out = session_windows(load_table(spark, sf_dir, "events"), gap="30 minutes")
    return out.select(
        F.unix_micros("session_start").alias("session_start_us"),
        "user_id",
        "n_events",
        "session_value",
    )


@register(
    "q25_sliding_windows",
    driver=False,  # r8 third rotation: multi-round green, windows keep q19; cedes to q105-q110
    oracle="""
SELECT epoch_us(window_start) AS window_start_us, event_type,
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

    out = sliding_value_avg(load_table(spark, sf_dir, "events"))
    return out.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type",
        "avg_value",
        "n_events",
    )


@register(
    "q23_user_activity",
    driver=False,  # demoted r5 after 4 driver-green rounds; slot went to q22
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       epoch_us(MIN(ts)) AS first_ts_us,
       epoch_us(MAX(ts)) AS last_ts_us,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
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
        F.unix_micros(F.min("ts")).alias("first_ts_us"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchases"),
    )


@register(
    "q28_asof_prev_click",
    driver=False,  # r8 rotation: 7x driver-green, cedes its slot to q99-q104 (join family keeps q29 band + q76 salted driver reps)
    oracle="""
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
       epoch_us(r.ts) AS asof_ts_us, r.value AS asof_value
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
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("asof_ts").alias("asof_ts_us"),
        "asof_value",
    )


@register(
    "q29_price_band_join",
    driver=False,  # r8 fourth rotation: 6x driver-green (joins keep q05/q76; as-of/band shapes stay pytest-covered via q28/q29); cedes its slot to q111-q116
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
    driver=False,  # r8 rotation: 6x driver-green, cedes its slot to q91-q98 (streaming twins keep q24/q25 windows)
    oracle="""
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
       epoch_us(c.ts) AS click_ts_us, c.value AS click_value
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

    out = purchases_with_recent_clicks(load_table(spark, sf_dir, "events"))
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("click_ts").alias("click_ts_us"),
        "click_value",
    )


@register(
    "q66_variant_props",
    driver=False,  # r8 fourth rotation: 6x driver-green (JSON/Variant path stays pytest-covered via q20/q66); cedes its slot to q111-q116
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


@register(
    "q76_salted_hot_user_join",
    driver=False,  # r9 rotation: 6x driver-green, cedes its slot to q119-q136 (events keep q93/q94/q114/q130/q135)
    # promoted r3: rotated into the driver surface for a hard verdict
    oracle="""
SELECT e.user_id, u.n_total,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events e
JOIN (SELECT user_id, COUNT(*) AS n_total FROM events GROUP BY user_id) u
  ON e.user_id = u.user_id
GROUP BY e.user_id, u.n_total
""",
    description="skew-safe equi-join: the fact side is salted across shuffle sub-keys before joining the per-user dim (operators/skew.salted_join) — result provably equals the plain join",
    tags=("join", "skew", "events"),
)
def q76_salted_hot_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_mrdf_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_total"))
    joined = salted_join(ev.select("user_id", "value"), dim, "user_id", n_salts=8)
    return joined.groupBy("user_id", "n_total").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC6)).cast("double").alias("total_value"),
    )


@register(
    "q93_funnel_analysis",
    # promoted r8: rotated into the driver surface for a hard verdict
    oracle="""
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS ts_view_us
  FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS ts_click_us
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.ts_view_us
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS ts_purchase_us
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.ts_click_us
  GROUP BY e.user_id)
SELECT v.user_id, v.ts_view_us, c.ts_click_us, p.ts_purchase_us,
       CAST(1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT AS BIGINT)
         AS funnel_stage
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
""",
    description=(
        "ordered-funnel analysis (view -> click -> purchase, strict "
        "event-time order): per user the first view, the first click AFTER "
        "that view, the first purchase AFTER that click, and the funnel "
        "stage reached — the conversion query every event warehouse runs. "
        "Exact integer epoch-micros end to end. Scale shape: three "
        "filtered scans each collapsing map-side to one MIN per user, "
        "user-keyed equi-joins in between (the per-stage frames are "
        "users-with-stage sized, monotonically shrinking down the funnel) "
        "— no windows over raw events, nothing corpus-crossed"
    ),
    tags=("events", "funnel", "agg", "join"),
    driver=False,  # r10 rotation: 2x driver-green (r8,r9), cedes its slot to q137-q155 (events keep q130/q135 + new q149/q150/q152)
)
def q93_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("ts_view_us"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("ts_view_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("ts_click_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("ts_click_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("ts_purchase_us"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "ts_view_us",
            "ts_click_us",
            "ts_purchase_us",
            (
                F.lit(1)
                + F.col("ts_click_us").isNotNull().cast("int")
                + F.col("ts_purchase_us").isNotNull().cast("int")
            ).cast("bigint").alias("funnel_stage"),
        )
    )


@register(
    "q94_cohort_retention",
    # promoted r8: rotated into the driver surface for a hard verdict
    oracle="""
WITH first_ev AS (
  SELECT user_id, MIN(epoch_us(ts)) AS first_us FROM events GROUP BY user_id)
SELECT first_us // 86400000000 AS cohort_day,
       (epoch_us(e.ts) - first_us) // 604800000000 AS week_offset,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
FROM events e JOIN first_ev f ON e.user_id = f.user_id
GROUP BY 1, 2
""",
    description=(
        "cohort retention matrix: users grouped by first-activity day, "
        "activity counted per whole-week offset from each user's OWN first "
        "event (integer epoch-micros division — no calendar-week dialect "
        "drift between engines, partition-independent). Scale shape: one "
        "map-side MIN per user, a user-keyed equi-join (broadcastable dim "
        "— one row per user), and a (cohort, offset)-keyed distinct-count "
        "with map-side partials; the matrix output is O(days x weeks)"
    ),
    tags=("events", "cohort", "agg", "join"),
    driver=False,  # r10 rotation: 2x driver-green (r8,r9), cedes its slot to q137-q155 (events keep q130/q135 + new q149/q150/q152)
)
def q94_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    first_ev = ev.groupBy("user_id").agg(F.min("ts_us").alias("first_us"))
    return (
        ev.join(first_ev, "user_id")
        .select(
            F.expr("first_us div 86400000000").alias("cohort_day"),
            F.expr("(ts_us - first_us) div 604800000000").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )


# Sentinel for an open-ended SCD2 interval: int64 max. A NULL
# valid_to would collect to pandas as float64 (dtype-sensitive hash
# drift — the q33/q58 round-1 failure class); the sentinel keeps the
# column int64 on both engines, and `is_current` carries the meaning.
_SCD2_OPEN_US = (1 << 63) - 1


@register(
    "q114_scd2_history",
    # promoted r8 (fourth rotation): q07/q12/q19/q29/q64/q66 ceded slots
    # r14 is an OPTIMIZATION round: the declared surface is frozen to the
    # r13 set (a query that disappears = regression), so the planned
    # q165 rotation is deferred; q165 runs in the pytest oracle gate.
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events),
changes AS (
  SELECT user_id, event_type, ts_us, event_id FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type),
iv AS (
  SELECT user_id, event_type, ts_us AS valid_from_us,
         lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS nxt
  FROM changes)
SELECT user_id, event_type, valid_from_us,
       CAST(COALESCE(nxt, {_SCD2_OPEN_US}) AS BIGINT) AS valid_to_us,
       (nxt IS NULL) AS is_current
FROM iv
""",
    description=(
        "SCD type-2 history build (the CDC/warehouse dimension shape): "
        "collapse each user's event stream into [valid_from, valid_to) "
        "intervals of their current event_type — a change row opens an "
        "interval, the next change closes it, the last stays open "
        "(is_current, int64-max sentinel so the column never goes float "
        "under NULL). Two windows partitioned by user_id, no global "
        "sort; ties broken by event_id so the interval chain is "
        "deterministic on any engine"
    ),
    tags=("events", "windows", "cdc"),
)
def q114_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_type = F.lag("event_type").over(w)
    changes = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        (prev_type.isNull() | (prev_type != F.col("event_type"))).alias("is_change"),
    ).filter("is_change")
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    nxt = F.lead("ts_us").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.coalesce(nxt, F.lit(_SCD2_OPEN_US)).cast("bigint").alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


# --- q130: linear multi-touch attribution -----------------------------------

_ATTR_HOURS = 48


@register(
    "q130_linear_attribution",
    # promoted r9: takes a slot ceded by the multi-green r9 rotation
    # (see tests/test_oracle_queries.py DRIVER_SURFACE)
    oracle=f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'),
tch AS (
  SELECT user_id, ts AS click_ts,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 AS channel
  FROM events WHERE event_type = 'click'),
pairs AS (
  SELECT c.conv_id, c.value, t.click_ts, t.channel
  FROM conv c LEFT JOIN tch t
    ON c.user_id = t.user_id
   AND t.click_ts <= c.ts
   AND t.click_ts >= c.ts - INTERVAL {_ATTR_HOURS} HOUR),
w AS (
  SELECT conv_id, value, channel, click_ts,
         COUNT(click_ts) OVER (PARTITION BY conv_id) AS n_touches
  FROM pairs)
SELECT COALESCE(channel, -1) AS channel,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_conversions,
       CAST(COUNT(click_ts) AS BIGINT) AS n_touches,
       CAST(SUM(CASE WHEN n_touches = 0 THEN CAST(FLOOR(value * 1000000.0) AS BIGINT)
                     ELSE CAST(FLOOR((value * 1000000.0) / n_touches) AS BIGINT) END)
            AS BIGINT) AS credit_e6
FROM w GROUP BY COALESCE(channel, -1)
""",
    description=(
        f"linear multi-touch attribution: every purchase splits its value "
        f"equally across ALL the user's clicks in the prior {_ATTR_HOURS}h "
        "(json-extracted channel), unmatched purchases land in channel -1 "
        "with full credit — the marketing-warehouse op q28's single-touch "
        "as-of join cannot express; credits in integer micro-units "
        "(floor((value*1e6)/n) — one IEEE divide + floor, bit-portable) "
        "so the per-channel SUM is exact integer arithmetic"
    ),
    tags=("events", "join", "window", "agg"),
)
def q130_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel linear attribution over a lookback window.

    Scale shape: the touch join is an EQUI-join on user_id (the range
    predicate filters inside each user's bounded event set — no band
    join needed because the key is already fine-grained); n_touches is
    a per-conversion window (one conversion's touches are bounded by
    one user's activity); the final rollup is a 4-row hash aggregate.
    Credits are integer micro-units so the sum survives any
    aggregation order on any engine."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id", "ts", "value"
    )
    tch = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("click_ts"),
        (F.get_json_object("props", "$.k").cast("bigint") % 3).alias("channel"),
    )
    pairs = conv.join(
        tch,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("click_ts") <= F.col("ts"))
        & (F.col("click_ts") >= F.col("ts") - F.expr(f"INTERVAL {_ATTR_HOURS} HOURS")),
        "left",
    )
    w = Window.partitionBy("conv_id")
    scored = pairs.select(
        "conv_id",
        "value",
        "channel",
        "click_ts",
        F.count("click_ts").over(w).alias("n_touches"),
    )
    credit = F.when(
        F.col("n_touches") == 0,
        F.floor(F.col("value") * 1000000.0).cast("bigint"),
    ).otherwise(
        F.floor((F.col("value") * 1000000.0) / F.col("n_touches")).cast("bigint")
    )
    return (
        scored.select(
            F.coalesce(F.col("channel"), F.lit(-1)).alias("channel"),
            "conv_id",
            "click_ts",
            credit.alias("credit"),
        )
        .groupBy("channel")
        .agg(
            F.countDistinct("conv_id").alias("n_conversions"),
            F.count("click_ts").alias("n_touches"),
            F.sum("credit").alias("credit_e6"),
        )
    )


# --- q135: user-journey path analysis ----------------------------------------

_PATH_LEN = 5


@register(
    "q135_top_user_paths",
    # promoted r9: takes a slot ceded by the multi-green r9 rotation
    # (see tests/test_oracle_queries.py DRIVER_SURFACE)
    oracle=f"""
WITH p AS (
  SELECT user_id,
         array_to_string(
           list_slice(list(event_type ORDER BY ts, event_id), 1, {_PATH_LEN}),
           '>') AS path
  FROM events GROUP BY user_id)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY path
""",
    description=(
        f"user-journey path analysis (funnel DISCOVERY, where q93 "
        f"measures a known funnel): each user's first {_PATH_LEN} events "
        "in strict (ts, event_id) order collapse to a '>' path string, "
        "counted across users — the query that finds which funnels to "
        "measure; per-user sort_array is bounded by one user's events, "
        "the path dictionary agg is output-sized"
    ),
    tags=("events", "agg", "window"),
)
def q135_top_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path frequency table over per-user event prefixes.

    Scale shape: ONE shuffle on user_id; the in-group sort is
    sort_array over one user's collected (ts, event_id, type) structs —
    bounded by per-user activity, never a window over raw events — and
    the second agg groups by path strings whose cardinality is the
    output's. The slice keeps state at {_PATH_LEN} events per user."""
    ev = load_table(spark, sf_dir, "events")
    ordered = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    path = F.array_join(
        F.slice(F.transform(ordered, lambda s: s["event_type"]), 1, _PATH_LEN),
        ">",
    )
    return (
        ev.groupBy("user_id")
        .agg(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --- q149: time-series gap-fill / resample ----------------------------------
#
# The warehouse resample: per-user HOURLY grid spanning each user's
# active interval, event counts zero-filled in gap hours, and a
# level-type metric (the hour's max value, micro-unit fixed point)
# carried forward LOCF — counts are flow (a silent hour really is 0),
# levels are state (a silent hour keeps the last reading). Grid
# generation is per-user sequence+explode (span-bounded, never a
# calendar cross join); LOCF is last(ignorenulls) over the per-user
# hour order.

_GAPFILL_USERS = 20  # bound the output: first N users


@register(
    "q149_hourly_gap_fill",
    driver=True,  # promoted r10: owed rotation for the r9-registered operators
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS h,
         CAST(floor(value * 1000000.0) AS BIGINT) AS v_e6
  FROM events WHERE user_id < {_GAPFILL_USERS}),
hourly AS (
  SELECT user_id, h, CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(v_e6) AS lvl_e6
  FROM ev GROUP BY user_id, h),
span AS (
  SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM ev GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM span)
SELECT g.user_id, g.h * 3600000000 AS hour_us,
       COALESCE(hh.n_events, 0) AS n_events,
       last_value(hh.lvl_e6 IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lvl_e6
FROM grid g LEFT JOIN hourly hh ON g.user_id = hh.user_id AND g.h = hh.h
""",
    description=(
        "per-user hourly resample: zero-filled event counts in gap "
        "hours + LOCF carry-forward of the level metric (max value, "
        "micro-unit integers); grid via per-user sequence, never a "
        "calendar cross join"
    ),
    tags=("events", "window", "timeseries"),
)
def q149_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series per user.

    Scale shape: the grid explodes ≤ span-hours rows per user (a
    per-user sequence — the calendar table never cross-joins the
    corpus); the fill join is equi-keyed on (user, hour); LOCF is a
    per-user ordered window. All values integer micro-units."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < _GAPFILL_USERS
    ).select(
        "user_id",
        # integer div on BOTH engines: float-quotient-cast-to-long equals
        # floor only for non-negative epochs and risks double rounding at
        # the margins (advisor r9) -- `div` matches the oracle's `//`.
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
        # explicit floor on BOTH sides: Spark's double->bigint cast
        # truncates, DuckDB's rounds half-even — a one-ulp value like
        # 16.15*1e6 = 16149999.999... would split the engines
        F.floor(F.col("value") * 1_000_000.0).cast("bigint").alias("v_e6"),
    )
    hourly = ev.groupBy("user_id", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("v_e6").alias("lvl_e6"),
    )
    span = ev.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = span.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            (F.col("h") * 3_600_000_000).alias("hour_us"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
            F.last("lvl_e6", ignorenulls=True).over(w).alias("lvl_e6"),
        )
    )


# --- q150: rate-spike detection over the dense hourly grid ------------------
#
# Monitoring's core query on q149's machinery: per event-type hourly
# counts on a ZERO-FILLED grid (a silent hour is a real 0 — trailing
# windows over sparse hours silently misalign), then a spike flag by
# comparing each hour against its trailing 24h baseline with PURE
# INTEGER cross-multiplication: n · window_hours > 3 · window_sum —
# no division, no floats, no epsilon; bit-identical on any engine.


@register(
    "q150_hourly_rate_spikes",
    driver=True,  # promoted r10: owed rotation for the r9-registered operators
    oracle="""
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events),
hourly AS (
  SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS n
  FROM ev GROUP BY event_type, h),
span AS (
  SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM ev GROUP BY event_type),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM span),
dense AS (
  SELECT g.event_type, g.h, COALESCE(hh.n, 0) AS n
  FROM grid g LEFT JOIN hourly hh
    ON g.event_type = hh.event_type AND g.h = hh.h),
scored AS (
  SELECT event_type, h, n,
         COUNT(*) OVER w AS win_hours,
         COALESCE(CAST(SUM(n) OVER w AS BIGINT), 0) AS win_sum
  FROM dense
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
SELECT event_type, h * 3600000000 AS hour_us, n,
       CAST(win_hours AS BIGINT) AS win_hours, win_sum,
       (win_hours >= 12 AND n * win_hours > 3 * win_sum) AS is_spike
FROM scored
""",
    description=(
        "rate-spike monitoring: zero-filled per-type hourly grid + "
        "trailing-24h baseline compared by integer cross-multiplication "
        "(n*hours > 3*sum) — no division, no floats, no epsilon"
    ),
    tags=("events", "window", "timeseries", "quality"),
)
def q150_hourly_rate_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours where an event type ran >3x its trailing-24h mean.

    Scale shape: grid explode bounded by span-hours per type; the
    baseline is one per-type ordered window (count+sum over 24
    preceding rows); the spike predicate is integer arithmetic, so the
    flag itself sits under the hash verdict."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        # integer div on BOTH engines: float-quotient-cast-to-long equals
        # floor only for non-negative epochs and risks double rounding at
        # the margins (advisor r9) -- `div` matches the oracle's `//`.
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
    )
    hourly = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    span = ev.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select("event_type", F.explode(F.sequence("h0", "h1")).alias("h"))
    dense = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    return dense.select(
        "event_type",
        (F.col("h") * 3_600_000_000).alias("hour_us"),
        "n",
        F.count(F.lit(1)).over(w).cast("bigint").alias("win_hours"),
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("bigint").alias("win_sum"),
        (
            (F.count(F.lit(1)).over(w) >= 12)
            & (F.col("n") * F.count(F.lit(1)).over(w) > 3 * F.coalesce(F.sum("n").over(w), F.lit(0)))
        ).alias("is_spike"),
    )


# --- q151: RANGE-interval window frames --------------------------------------
#
# The frame kind the grid queries (q149/q150) deliberately avoid and
# irregular event streams need directly: a trailing TWO-HOUR frame by
# actual event time (RANGE BETWEEN), not by row count — on bursty
# streams a 24-row frame spans minutes for a hot user and weeks for an
# idle one. Values integer micro-units; the trailing average is the
# exact rational (sum, count) pair rather than a divided float, so the
# verdict is a hash match.


@register(
    "q151_trailing_range_window",
    driver=True,  # promoted r10: owed rotation for the r9-registered operators
    oracle="""
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CAST(COUNT(*) OVER w - 1 AS BIGINT) AS n_prior_2h,
       COALESCE(CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) OVER w
                - CAST(floor(value * 1000000.0) AS BIGINT) AS BIGINT), 0)
         AS sum_prior_2h_e6
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW)
""",
    description=(
        "trailing 2-hour RANGE frame per user on the irregular event "
        "stream (time-range, not row-count): prior-event count and "
        "micro-unit value sum, exact integers under the hash verdict"
    ),
    tags=("events", "window", "timeseries"),
)
def q151_trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: how much activity the same user had in the preceding
    two hours (exclusive of the current event).

    Scale shape: one user-partitioned ordered window with a RANGE
    frame on epoch-micros — Spark evaluates it in a single pass per
    partition with a sliding frame head/tail, same cost class as a
    rows frame; no self-join, no grid materialization. The
    current-row value is subtracted out rather than using `1
    PRECEDING` because RANGE frames bound by VALUE: ties at the same
    timestamp belong in the frame, and excluding the row itself (not
    its timestamp) is the semantics both engines agree on."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.floor(F.col("value") * 1_000_000.0).cast("bigint").alias("v_e6"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-7_200_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        (F.count(F.lit(1)).over(w) - 1).cast("bigint").alias("n_prior_2h"),
        F.coalesce(
            (F.sum("v_e6").over(w) - F.col("v_e6")).cast("bigint"), F.lit(0)
        ).alias("sum_prior_2h_e6"),
    )


# --- q152: join-key skew profile ---------------------------------------------


@register(
    "q152_user_key_skew_profile",
    driver=True,  # promoted r10: owed rotation for the r9-registered operators
    oracle="""
WITH per_key AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id),
bucketed AS (
  SELECT CASE WHEN user_id IS NULL THEN -1
              ELSE CAST(floor(log2(n)) AS BIGINT) END AS log2_bucket, n
  FROM per_key)
SELECT log2_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MAX(n) AS BIGINT) AS max_key_rows
FROM bucketed GROUP BY log2_bucket
""",
    description=(
        "join-key skew diagnosis (operators/skew.py:key_skew_profile): "
        "per-key counts rolled up by log2 frequency bucket — the "
        "'why is this join slow' report that decides between "
        "salted_join / AQE skew / broadcast; exact integers"
    ),
    tags=("events", "skew", "agg"),
)
def q152_user_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-bucket histogram of events.user_id.

    Scale shape: the per-key count is the SAME shuffle the diagnosed
    join would pay (one profiling pass = one join-shaped pass); the
    rollup is bucket-keyed and output-sized."""
    from pyspark_mrdf_spark.operators.skew import key_skew_profile

    ev = load_table(spark, sf_dir, "events")
    return key_skew_profile(ev, "user_id")
