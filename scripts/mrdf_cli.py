"""Drop-in CLI for the reference's ``main.py`` (same flags, same
defaults — reference main.py:16-29), running on this engine.

Differences, by design:
 - input decodes on executors (the reference decoded in the driver,
   main.py:31 — its documented scale failure);
 - output is JSON-lines adjacency (``(id, [neighbors])`` as JSON, not
   Python repr) — re-readable by any engine, including recall_cli.py.

Example:
  python scripts/mrdf_cli.py --inputfile data.fvecs --outputfile out_mrdf --k 10
  python scripts/mrdf_cli.py --inputfile data.fvecs --outputfile out_knn --k 10 --bruteforce
  python scripts/recall_cli.py --knn out_knn --mrdf out_mrdf
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_mrdf_spark.algorithms.mrdf import knn_graph
from pyspark_mrdf_spark.operators.similarity import knn_exact
from pyspark_mrdf_spark.session import get_spark
from pyspark_mrdf_spark.sources.fvecs import read_fvecs, write_adjacency_json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rho", type=int, default=15, help="The dividing factor. 15 by default.")
    parser.add_argument("--alpha", type=int, default=150000, help="The maximum subset size. 150000 by default.")
    parser.add_argument("--k", type=int, default=30, help="Number of neighbors. 30 by default.")
    parser.add_argument("--tau", type=float, default=0.01, help="Early termination threshold. 0.01 by default.")
    parser.add_argument("--randomseed", type=int, default=42, help="Random seed used for MRDF. 42 by default.")
    parser.add_argument("--maxiterations", type=int, default=0, help="Maximum number of iterations (default 0 for no max)")
    parser.add_argument("--inputmax", type=int, default=0, help="Maximum number of input vectors to take (0 = all).")
    parser.add_argument("--inputfile", type=str, required=True, help="FVECS input file (or shard directory)")
    parser.add_argument("--outputfile", type=str, default="output", help="Output folder. Default 'output'.")
    parser.add_argument("--bruteforce", action="store_true", help="Run brute-force KNN instead of MRDF.")
    args = parser.parse_args()

    spark = get_spark(app_name="MRDF")
    spark.sparkContext.setLogLevel("ERROR")
    vecs = read_fvecs(spark, args.inputfile, input_max=args.inputmax)

    start = time.time()
    if args.bruteforce:
        print("Running brute force KNN ...")
        g = knn_exact(vecs, args.k)
    else:
        print("Running MRDF ...")
        g = knn_graph(
            vecs,
            args.k,
            rho=args.rho,
            alpha=args.alpha,
            tau=args.tau,
            seed=args.randomseed,
            max_iter=args.maxiterations,
        )
    write_adjacency_json(g, args.outputfile)
    print(f"Total time taken to run algorithm: {time.time() - start} s")


if __name__ == "__main__":
    main()
