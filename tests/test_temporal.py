"""asof_join: randomized equivalence against a naive per-row reference
implementation, plus band_join containment law."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from pyspark_mrdf_spark.operators.temporal import asof_join, band_join


def test_asof_join_matches_naive(spark):
    rng = random.Random(7)
    base = dt.datetime(2026, 1, 1)
    left_rows = [
        (i, rng.randint(0, 3), base + dt.timedelta(seconds=rng.randint(0, 5000)), float(i))
        for i in range(200)
    ]
    right_rows = [
        (rng.randint(0, 3), base + dt.timedelta(seconds=rng.randint(0, 5000)), 1000.0 + j)
        for j in range(150)
    ]
    # the operator's contract: right side unique per (key, ts)
    seen = set()
    right_rows = [r for r in right_rows if not (r[:2] in seen or seen.add(r[:2]))]

    left = spark.createDataFrame(left_rows, ["event_id", "user_id", "ts", "value"])
    right = spark.createDataFrame(right_rows, ["user_id", "ts", "value"])
    got = {
        r["event_id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(left, right, "user_id").collect()
    }

    for event_id, key, ts, _ in left_rows:
        cand = [(rts, rv) for rk, rts, rv in right_rows if rk == key and rts <= ts]
        expect = max(cand) if cand else (None, None)
        assert got[event_id] == expect, (event_id, got[event_id], expect)


def test_band_join_containment(spark):
    facts = spark.range(100).select((F.col("id") * 1.0).alias("v"))
    bands = spark.createDataFrame(
        [(0, 0.0, 25.0), (1, 25.0, 50.0), (2, 50.0, 101.0)], ["band_id", "lo", "hi"]
    )
    out = band_join(facts, bands, "v").collect()
    assert len(out) == 100  # every value falls in exactly one band
    for r in out:
        assert r["lo"] <= r["v"] < r["hi"]
