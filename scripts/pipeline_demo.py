"""End-to-end training-data pipeline on this engine — every stage is a
library operator that also has an oracle-checked query; this script
chains them the way a production corpus build would, printing one JSON
line of stage-by-stage counts.

    ingest (parquet scan)
      → promotion gate           (operators.quality report, q144 semantics —
                                  reject the batch outright on violations)
      → quality filter           (functions.text scoring, q32 semantics)
      → LM band filter           (operators.lm stupid-backoff, q110)
      → exact dedup              (operators.dedup.dedup_against / exact_duplicates, q40)
      → ExactSubstr scrub        (operators.dedup.scrub_dup_substrings, q109)
      → near-dup pairs           (jaccard_pairs + max_df stoplist, q41)
      → duplicate clusters       (connected_components, q72)
      → canonical selection      (cluster-min + unpaired, q73)
      → link-quality prior       (operators.graph.pagerank, q113)
      → mixture sampling         (md5-uniform per-language rates, q71)
      → token-budget shard packing (windowed cumsum per source, q70)
      → shard write              (partitioned parquet sink)

Usage: python scripts/pipeline_demo.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_mrdf_spark.functions import text as T
from pyspark_mrdf_spark.io import load_table, write_partitioned
from pyspark_mrdf_spark.operators import dedup as D
from pyspark_mrdf_spark.queries.pipeline import (
    mixture_rate_col,
    mixture_uniform_col,
    shard_id_col,
)
from pyspark_mrdf_spark.session import get_spark


def main(sf_dir: str, out_dir: str) -> None:
    spark = get_spark(app_name="pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    stages: dict[str, int] = {}

    docs = load_table(spark, sf_dir, "documents")
    stages["ingested"] = docs.count()

    # promotion gate (q144 semantics): N constraints in ONE aggregation
    # scan — a corrupted delivery should stop the pipeline here, not
    # surface as a mystery three stages later
    from pyspark_mrdf_spark.operators.quality import (
        InSet,
        NotNull,
        Satisfies,
        Unique,
        quality_report,
    )

    gate = quality_report(
        docs,
        [
            NotNull("text"),
            Unique("doc_id"),
            InSet("lang", ("en", "de", "fr", "es", "zh")),
            Satisfies("n_chars = length(text)", "n_chars_consistent"),
        ],
    ).collect()
    gate_violations = sum(r["violations"] for r in gate)
    stages["gate_violations"] = int(gate_violations)
    if gate_violations:
        raise SystemExit(f"promotion gate failed: {gate}")

    # quality filter: enough tokens and at least one stopword hit
    nt = T.n_tokens("text")
    quality = docs.filter((nt >= 20) & (T.stopword_hits("text") > 0)).localCheckpoint()
    stages["quality_pass"] = quality.count()

    # LM band filter (CCNet-style, q110 semantics): trigram
    # stupid-backoff trained on the heuristically-clean docs, keep
    # the reference-like band by integer fixed-point mean score
    from pyspark_mrdf_spark.operators.lm import lm_score, lm_train

    tri, bi, uni = lm_train(quality)
    in_band = lm_score(quality, tri, bi, uni).filter(
        F.col("mean_score_e6") >= 20_000
    )
    banded = quality.join(in_band.select("doc_id"), "doc_id").localCheckpoint()
    stages["lm_band_pass"] = banded.count()

    # exact dedup: lowest id per fingerprint survives
    keep = banded.groupBy(F.md5("text").alias("fp")).agg(F.min("doc_id").alias("doc_id"))
    exact = banded.join(keep.select("doc_id"), "doc_id").localCheckpoint()
    stages["after_exact_dedup"] = exact.count()

    # ExactSubstr scrub (q109 semantics): delete duplicated runs the
    # doc-level dedup cannot see; downstream stages consume the
    # scrubbed text
    scrub = D.scrub_dup_substrings(exact)
    exact = (
        exact.drop("text")
        .join(scrub.select("doc_id", F.col("clean_text").alias("text")), "doc_id")
        .localCheckpoint()
    )
    stages["scrubbed_chars_removed"] = int(
        exact.selectExpr("sum(n_chars - length(text))").collect()[0][0]
    )

    # near-dup pairs -> clusters -> canonical member per cluster
    pairs = D.jaccard_pairs(exact, n=3, max_df=1000).filter(F.col("jaccard") >= 0.1)
    clusters = D.connected_components(pairs)
    stages["near_dup_clusters"] = clusters.select("cluster_id").distinct().count()
    canonical = (
        exact.join(clusters, "doc_id", "left")
        .filter(F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id")))
        .drop("cluster_id")
        .localCheckpoint()
    )
    stages["canonical"] = canonical.count()

    # link-graph quality prior (q113 semantics): integer fixed-point
    # pagerank over the synthesized citation graph, drop the
    # lowest-centrality decile — the CCNet/RefinedWeb-style
    # host-quality weighting step, here at doc granularity
    from pyspark_mrdf_spark.operators.graph import pagerank

    n_docs = stages["ingested"]
    did = F.col("doc_id")
    edges = docs.select(
        did.alias("src"),
        F.explode(
            F.slice(
                F.array(
                    (did * 7 + 1) % n_docs,
                    (did * 13 + 2) % n_docs,
                    (did * 29 + 3) % n_docs,
                ),
                1,
                (did % 3 + 1).cast("int"),
            )
        ).alias("dst"),
    )
    ranks = pagerank(edges, nodes=docs.select(did.alias("node")), n_iter=5)
    cut = ranks.approxQuantile("p", [0.1], 0.0)[0]  # exact decile
    weighted = (
        canonical.join(ranks.withColumnRenamed("node", "doc_id"), "doc_id")
        .filter(F.col("p") >= cut)
        .drop("p")
        .localCheckpoint()
    )
    stages["link_quality_pass"] = weighted.count()

    # deterministic mixture sampling (portable md5 uniform) — the SAME
    # column expressions the oracle-checked q71 uses
    mixed = weighted.filter(mixture_uniform_col() < mixture_rate_col())
    stages["mixture_sampled"] = mixed.count()

    # token-budget shard packing per source, then partitioned write
    tok = T.n_tokens("text").cast("bigint")
    packed = mixed.select(
        "doc_id", "source", "lang", "text", shard_id_col(tok).alias("shard_id")
    )
    write_partitioned(packed, out_dir, ["source", "shard_id"])
    stages["shards_written"] = (
        spark.read.parquet(out_dir).select("source", "shard_id").distinct().count()
    )
    stages["rows_written"] = spark.read.parquet(out_dir).count()

    print(json.dumps({"metric": "pipeline_demo", "sf_dir": sf_dir, "stages": stages,
                      "seconds": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(tempfile.gettempdir(), "pipeline_demo_out")
    main(sf, out)
