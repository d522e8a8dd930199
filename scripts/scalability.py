"""Scalability harness (reference W6, testdatascalability.py:10-43):
run the vector-engine pipeline over increasing data sizes and record
(n_vectors, seconds) pairs, plus the relational flagship at each sf.

Usage:  python scripts/scalability.py [sf0.001 sf0.01 sf0.1]

Prints one JSON line:
  {"metric": "scalability_sweep", "points": [{"sf":..., "n":...,
    "knn_exact_s":..., "mrdf_s":..., "mrdf_recall":..., "flagship_s":...}]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_mrdf_spark.algorithms.mrdf import knn_graph
from pyspark_mrdf_spark.algorithms.recall import recall
from pyspark_mrdf_spark.io import load_table
from pyspark_mrdf_spark.operators.similarity import knn_exact
from pyspark_mrdf_spark.queries import load_all
from pyspark_mrdf_spark.session import get_spark

K = 10


def main() -> None:
    sfs = sys.argv[1:] or ["sf0.001", "sf0.01", "sf0.1"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="pyspark-mrdf-scalability", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    flagship = load_all()["q05_local_supplier_volume"]
    points = []
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()

        t0 = time.time()
        g_exact = knn_exact(emb, K)
        g_exact.write.format("noop").mode("overwrite").save()
        t_exact = time.time() - t0

        t0 = time.time()
        g = knn_graph(emb, K, rho=4, alpha=600, tau=0.01, seed=42, max_iter=3, refine_rounds=2)
        g.write.format("noop").mode("overwrite").save()
        t_mrdf = time.time() - t0

        r = recall(knn_exact(emb, K), g)

        t0 = time.time()
        flagship.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t_flag = time.time() - t0

        points.append(
            {
                "sf": sf,
                "n": n,
                "knn_exact_s": round(t_exact, 2),
                "mrdf_s": round(t_mrdf, 2),
                "mrdf_recall": round(r, 4),
                "flagship_s": round(t_flag, 2),
            }
        )
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    print(json.dumps({"metric": "scalability_sweep", "points": points}))


if __name__ == "__main__":
    main()
