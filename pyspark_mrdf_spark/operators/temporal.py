"""Temporal / non-equi join operators Spark lacks as built-ins.

``asof_join`` — for each left row, the latest right row with
``right.ts <= left.ts`` per key (the time-series "most recent fact"
join). Spark has no ASOF JOIN; the naive formulation is a θ-join +
per-row max (quadratic per key). This implementation is the
scale-correct union trick: tag both sides, sort once per key by
(ts, side), and carry the right side's values forward with
``last(ignorenulls) over rows unbounded preceding`` — ONE shuffle on
the key, linear work, no range explosion. DuckDB's native ASOF JOIN
is the oracle.

``band_join`` — range (interval containment) join of a fact column
against a small band/interval table via broadcast; the band table is
per definition small (it partitions a value domain), so the
non-equi condition rides a broadcast nested loop, never a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``prefix+ts_col`` and
    ``prefix+c`` for each value col — from the latest ``right`` row at
    or before the left row's timestamp, per ``key`` (null when no such
    row). Right rows tie-breaking at identical (key, ts) is undefined;
    deduplicate the right side first if that can occur."""
    r_cols = [F.col(key), F.col(ts_col)]
    r_cols.append(F.col(ts_col).alias(f"{prefix}{ts_col}"))
    for c in value_cols:
        r_cols.append(F.col(c).alias(f"{prefix}{c}"))
    r = right.select(*r_cols).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal ts ⇒ `ts >= right.ts`
    # inclusive semantics, matching SQL ASOF JOIN
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{prefix}{ts_col}"] + [f"{prefix}{c}" for c in value_cols]
    for c in carried:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side")


def band_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Interval-containment join: fact rows matched to the band with
    ``lo <= value < hi``. The band table broadcasts (it is small by
    construction), so the range condition never shuffles the facts."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond)
