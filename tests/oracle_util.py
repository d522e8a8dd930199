"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side, then
compares row count, schema arity, and order-insensitive values with
EXACT equality for every cell (the driver hashes values, so "close"
floats are not good enough — the engine's decimal-intermediate
discipline must make them bit-identical).
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return v


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def compare_query(spark, sf_dir: str, name: str, builder, oracle):
    from pyspark_mrdf_spark.queries import resolve_oracle

    oracle = resolve_oracle(oracle, sf_dir)
    sdf = builder(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    con = duck_con(sf_dir)
    ddf = con.execute(oracle)
    dcols = [d[0] for d in ddf.description]
    drows = [tuple(r) for r in ddf.fetchall()]
    con.close()

    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    assert sorted(scols) == sorted(dcols), f"{name}: columns {sorted(scols)} vs oracle {sorted(dcols)}"

    _, s_canon = _canon_rows(scols, srows)
    _, d_canon = _canon_rows(dcols, drows)
    mismatches = [(a, b) for a, b in zip(s_canon, d_canon) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[0]}"
