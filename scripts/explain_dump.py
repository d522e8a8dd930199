"""Dump ``explain("formatted")`` for every driver-facing query.

Usage: python scripts/explain_dump.py <out_dir> [suffix] [sf_dir] [only...]

Writes ``<out_dir>/<query>_<suffix>.txt`` (default suffix ``before``)
for each driver query at sf0.1 — the optimization round's plan
evidence (plans/r14/*_before.txt / *_after.txt).

Builders run for real (some materialize session-memoized intermediates
or write persisted indexes), so the captured plan is the one the bench
executes — including LogicalRDD leaves where the memoization registry
serves a materialized sub-result.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4:])

    from pyspark_mrdf_spark.queries import driver_registry
    from pyspark_mrdf_spark.session import get_spark

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain-dump")
    spark.sparkContext.setLogLevel("ERROR")

    for name, spec in sorted(driver_registry().items()):
        if only and name not in only:
            continue
        try:
            df = spec.builder(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = "EXPLAIN FAILED:\n" + traceback.format_exc()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"[explain] {name} -> {path}")


if __name__ == "__main__":
    main()
