"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query timing includes plan build + execution to a count/collect
action (results are not shipped to the driver beyond tiny summaries).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from pyspark_mrdf_spark.session import get_spark
    from pyspark_mrdf_spark.queries import driver_registry, load_all

    spark = get_spark(app_name="pyspark-mrdf-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # Headline = the driver-facing surface (the 50 queries graded for
    # correctness). SPARK_GRAFT_BENCH_ALL=1 also times the pytest-only
    # overflow queries. This keeps the bench from paying MRDF twice:
    # q55 (graph only) is pytest-only, q56 (graph + recall) is timed.
    specs = load_all() if os.environ.get("SPARK_GRAFT_BENCH_ALL") else driver_registry()

    # Warmup: pay one-time JVM/codegen/Python-worker startup before the
    # first timed query so per-query numbers measure the engine, not
    # session initialization — including the first parquet-reader spin-up
    # on the largest fact table (q01 otherwise absorbs it).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).selectExpr(
        "sum(l_partkey)"
    ).collect()

    def run_once(spec) -> float:
        t0 = time.time()
        df = spec.builder(spark, sf_dir)
        # Force full execution without shipping rows to the driver.
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # Each query runs TWICE. "queries" is the first (cold-in-order)
    # run — comparable with earlier rounds and with what a fresh
    # session pays. "queries_warm" is the immediate second run: JIT,
    # parquet footers, and the session materialization registry are
    # hot, so it isolates steady-state plan cost from sandbox noise —
    # a cold/warm pair that diverges by 2-3x on an unchanged code path
    # is startup/noise, not a regression (see BASELINE.md, variance).
    # For index-building queries (q50/q56/q57...) warm is the SERVING
    # number (registry hit) and cold the BUILD number; both are real,
    # which is why the headline stays the cold sum rather than min.
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    failed: list[str] = []
    total = 0.0
    for name in sorted(specs):
        spec = specs[name]
        try:
            dt = run_once(spec)
        except Exception as exc:  # noqa: BLE001
            print(f"[bench] {name} failed: {exc}", file=sys.stderr)
            dt = float("nan")
            failed.append(name)
        timings[name] = round(dt, 3)
        if dt == dt:
            total += dt
            try:
                warm[name] = round(run_once(spec), 3)
            except Exception as exc:  # noqa: BLE001
                print(f"[bench] {name} warm rerun failed: {exc}", file=sys.stderr)
                if name not in failed:
                    failed.append(name)

    # Output discipline (round-6 postmortem): the grading driver keeps
    # only ~2KB of output, so the round-6 single 3KB line survived as a
    # clipped, unparseable tail. Three lines now, sized so EVERY capture
    # mode keeps a parseable record: (1) a tiny totals summary first
    # (survives head-capture), (2) the warm per-query dict on its own
    # line, (3) the contract line LAST — cold per-query timings at
    # 2-decimal precision (~1.5KB for 50 queries, fits a 2KB tail) —
    # so a "parse the last line" driver still gets the full headline.
    # The complete 3-decimal record also lands in BENCH_LOCAL.json,
    # committed in-repo, so the round's numbers never depend on the
    # driver's capture width again.
    full = {
        "metric": "engine_headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 3),
        "failed": failed,
        "sf": sf,
    }
    local_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
    try:
        with open(local_path, "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:
        print(f"[bench] could not write {local_path}: {exc}", file=sys.stderr)

    r2 = lambda d: {k: round(v, 2) for k, v in d.items()}  # noqa: E731
    print(
        json.dumps(
            {
                "metric": full["metric"],
                "value": full["value"],
                "unit": "sec",
                "sf": sf,
                "warm_total": full["warm_total"],
                "n_queries": len(timings),
                "failed": failed,
                "full_record": "BENCH_LOCAL.json",
            }
        )
    )
    print(json.dumps({"queries_warm": r2(warm)}))
    print(
        json.dumps(
            {
                "metric": full["metric"],
                "value": full["value"],
                "unit": "sec",
                "queries": r2(timings),
                "failed": failed,
                "sf": sf,
            }
        )
    )
    # Round-9 postmortem: a failed query used to ship as a silent NaN
    # with rc=0 (q136's sf0.1 overflow hid in BENCH_r09.json). A bench
    # that can lose a query silently will hide the next regression too —
    # fail loudly so the driver and CI both see red.
    if failed:
        print(f"[bench] FAILED queries: {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
