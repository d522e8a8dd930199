"""Run one query cold and print per-stage attribution from the Spark
REST status API: stage wall, executor run time, shuffle bytes, task
count — the guide §1.1 empirical loop without the browser.

Usage: python scripts/profile_query.py <query_name> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import bench

    spark, _ = bench._start_session()
    from pyspark_mrdf_spark.queries import load_all

    spec = load_all()[name]
    spark.sparkContext.setJobDescription(name + ":builder")
    t0 = time.time()
    df = spec.builder(spark, sf_dir)
    t_build = time.time() - t0
    spark.sparkContext.setJobDescription(name + ":action")
    df.write.format("noop").mode("overwrite").save()
    t_total = time.time() - t0
    print(f"== {name}: total {t_total:.2f}s (builder returned at {t_build:.2f}s)")

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
        jobs = json.loads(r.read())
    jobs.sort(key=lambda j: j["jobId"])
    print(f"{'job':>4} {'dur_s':>7}  {'stages':>7}  description")
    for j in jobs:
        from datetime import datetime

        try:
            st = datetime.strptime(j["submissionTime"], "%Y-%m-%dT%H:%M:%S.%fGMT")
            en = datetime.strptime(j["completionTime"], "%Y-%m-%dT%H:%M:%S.%fGMT")
            dur = (en - st).total_seconds()
        except Exception:
            dur = float("nan")
        print(
            f"{j['jobId']:>4} {dur:>7.2f}  {len(j.get('stageIds', [])):>7}  "
            f"{(j.get('description') or j.get('name',''))[:100]}"
        )

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = json.loads(r.read())
    # warmup stages come first; drop stages submitted before t0 wall
    stages.sort(key=lambda s: s.get("submissionTime", ""))
    rows = []
    for s in stages:
        rows.append(
            (
                s["stageId"],
                s.get("numCompleteTasks", 0),
                s.get("executorRunTime", 0) / 1000.0,
                s.get("shuffleReadBytes", 0) / 1e6,
                s.get("shuffleWriteBytes", 0) / 1e6,
                s.get("inputBytes", 0) / 1e6,
                (s.get("description") or s.get("name", ""))[:90],
            )
        )
    print(f"{'stage':>5} {'tasks':>5} {'exec_s':>8} {'shR_MB':>8} {'shW_MB':>8} {'in_MB':>7}  name")
    for r_ in rows:
        print(f"{r_[0]:>5} {r_[1]:>5} {r_[2]:>8.2f} {r_[3]:>8.1f} {r_[4]:>8.1f} {r_[5]:>7.1f}  {r_[6]}")
    tot_exec = sum(r_[2] for r_ in rows)
    print(f"total executor run time across stages: {tot_exec:.1f}s; n_stages={len(rows)}")


if __name__ == "__main__":
    main()
