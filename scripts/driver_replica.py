"""Replica of the verify driver: import __spark_entry__ from a clean
process, smoke-run entry(), then run every queries() entry at sf0.01
against its oracle_sql() via DuckDB with order-insensitive exact value
comparison. Usage: python scripts/driver_replica.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from tests.oracle_util import _canon_rows, duck_con


def main(sf_dir: str) -> int:
    # A plain session, as the driver would make it — NOT our tuned builder.
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("driver-replica")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )

    t0 = time.time()
    df = entry_mod.entry(spark)
    rows = df.collect()
    print(f"[entry] rows={len(rows)} cols={df.columns} in {time.time()-t0:.1f}s")
    assert len(df.columns) > 0

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    print(f"[registry] {len(qs)} queries, {len(oracles)} with oracle")

    con = duck_con(sf_dir)
    failed = []
    for name, builder in sorted(qs.items()):
        t0 = time.time()
        try:
            sdf = builder(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"spark error: {exc}"))
            print(f"[FAIL] {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: rows={len(srows)} in {time.time()-t0:.1f}s")
            continue
        ddf = con.execute(oracles[name])
        dcols = [d[0] for d in ddf.description]
        drows = [tuple(r) for r in ddf.fetchall()]
        status = "OK"
        if len(srows) != len(drows):
            status = f"ROWCOUNT {len(srows)} vs {len(drows)}"
        elif sorted(scols) != sorted(dcols):
            status = f"SCHEMA {sorted(scols)} vs {sorted(dcols)}"
        else:
            _, s_c = _canon_rows(scols, srows)
            _, d_c = _canon_rows(dcols, drows)
            bad = [(a, b) for a, b in zip(s_c, d_c) if a != b]
            if bad:
                status = f"VALUES {len(bad)} mismatched; first: {bad[0]}"
        tag = "ok" if status == "OK" else "FAIL"
        print(f"[{tag}] {name}: rows={len(srows)} in {time.time()-t0:.1f}s {'' if status=='OK' else status}")
        if status != "OK":
            failed.append((name, status))
    con.close()
    print(f"\n{'ALL GREEN' if not failed else 'FAILURES:'} {failed if failed else ''}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
