"""Drop-in CLI for the reference's ``getrecall.py`` (same flags):
recall of an approximate graph vs an exact one, both saved by
mrdf_cli.py as JSON-lines adjacency."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_mrdf_spark.algorithms.recall import recall
from pyspark_mrdf_spark.session import get_spark
from pyspark_mrdf_spark.sources.fvecs import read_adjacency_json


def _edges(df):
    return df.select(F.col("id").alias("src"), F.explode("neighbors").alias("dst"))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--knn", type=str, required=True, help="KNN output folder to compare")
    parser.add_argument("--mrdf", type=str, required=True, help="MRDF output folder to compare")
    args = parser.parse_args()

    spark = get_spark(app_name="MRDFGetRecall")
    spark.sparkContext.setLogLevel("ERROR")
    r = recall(
        _edges(read_adjacency_json(spark, args.knn)),
        _edges(read_adjacency_json(spark, args.mrdf)),
    )
    print(f"Recall: {r}")


if __name__ == "__main__":
    main()
