"""Scalability harness (reference W6, testdatascalability.py:10-43):
run the vector-engine pipeline over increasing data sizes and record
(n_vectors, seconds) pairs, plus the relational flagship at each sf.

Beyond the corpus scales (n ≤ 2000), a synthetic design-size point
(default n = 50,000, d = 64) exercises the code paths a cluster
deployment relies on but small data never reaches, and ASSERTS their
activation via the run metrics from ONE quality-configuration build
(α = 16384, centroid_broadcast_max_paths = 0):

 - division leaves land in (4096, 32768], so every leaf runs the
   TILED exact kernel (``nndescent._exact_block_tiled``) — asserted
   via max_leaf > 4096;
 - every division round extends tree paths through the DISTRIBUTED
   centroid join tier (``mrdf._extend_by_join``) instead of the
   driver-dict broadcast — asserted via join_tier_rounds ≥ 1 (the two
   tiers are equivalence-tested, so forcing the join tier changes the
   mechanism, never the graph).

The synthetic corpus is a seeded Gaussian MIXTURE (250 clusters,
center scale 2.5 — the shape real embedding corpora have; measured
recall 0.9999). ``--uniform`` adds a pure-Gaussian row: uniform
high-dim noise is the documented WORST CASE for any partition-based
ANN (neighborhoods barely beat random splits) — measured ~0.78 with
the escalation pinned off, 0.9628 hands-free (knn_graph auto-escalates
on the unconverged signal since r11). Reported for honesty, not
asserted.

Recall for every point is measured against the grid-blocked exact
graph (itself the q50 scale tier). All MRDF points run the SHIPPED
refinement setting (refine_rounds=1 — what q55/q56 register), so the
artifact describes the engine as deployed.

Usage:
  python scripts/scalability.py                      # corpus sfs + synthetic 50k
  python scripts/scalability.py sf0.01 sf0.1         # corpus subset only
  python scripts/scalability.py --synthetic-n 50000 --uniform
  python scripts/scalability.py --uniform-tuned-only # just the worst-case dial point
  python scripts/scalability.py --grid-only          # blocked-operator grid shapes at 50k

Prints one JSON line:
  {"metric": "scalability_sweep", "points": [...]}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Design-size points run 32 concurrent Arrow leaf tasks in ONE local
# JVM; the engine's 8g default heap OOMs around n=100k. That is a
# local-mode artifact (a cluster gives each executor its own heap), so
# the sweep asks for a bigger single JVM — overridable, never shrunk.
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

import numpy as np

from pyspark_mrdf_spark.algorithms.mrdf import knn_graph
from pyspark_mrdf_spark.algorithms.recall import recall
from pyspark_mrdf_spark.io import load_table
from pyspark_mrdf_spark.operators.similarity import knn_exact_blocked
from pyspark_mrdf_spark.queries import load_all
from pyspark_mrdf_spark.session import get_spark

K = 10


def _write_synthetic(
    path: str, n: int, d: int = 64, seed: int = 7, k_clusters: int | None = 250,
    center_scale: float = 2.5, aniso: bool = False,
) -> None:
    """Seeded synthetic embeddings table with the corpus schema
    (vec_id int64, embedding list<float>, label int32), written via
    pyarrow — no driver-side Spark row materialization.

    ``k_clusters`` set → Gaussian mixture (cluster centers
    ~N(0, center_scale²·I), unit within-cluster noise; label = cluster)
    — the clustered shape real embedding corpora have. ``None`` → pure
    unit Gaussian, the worst case for partition-based ANN."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    if k_clusters:
        centers = rng.standard_normal((k_clusters, d)) * center_scale
        assign = rng.integers(0, k_clusters, n)
        x = (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)
        labels = assign.astype(np.int32)
        if aniso:
            # decaying spectrum (the shape trained embeddings have —
            # PCA's target regime): per-dim scale ramps 4.0 -> 0.1
            x *= np.linspace(4.0, 0.1, d, dtype=np.float32)[None, :]
    else:
        x = rng.standard_normal((n, d), dtype=np.float32)
        labels = (np.arange(n) % 5).astype(np.int32)
    emb = pa.ListArray.from_arrays(
        pa.array(np.arange(n + 1, dtype=np.int64) * d, type=pa.int32()),
        pa.array(x.reshape(-1), type=pa.float32()),
    )
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), type=pa.int64()),
            "embedding": emb,
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(t, os.path.join(path, "embeddings.parquet"))


def _mrdf_point(spark, emb, label: str, max_iter: int = 3, refine_rounds: int = 1, **kw) -> dict:
    metrics: list = []
    t0 = time.time()
    g = knn_graph(
        emb, K, tau=0.01, seed=42, max_iter=max_iter, refine_rounds=refine_rounds,
        metrics_out=metrics, **kw,
    ).localCheckpoint(eager=True)
    t_mrdf = time.time() - t0
    return {"label": label, "mrdf_s": round(t_mrdf, 2), "graph": g, "metrics": metrics}


def main() -> None:
    argv = sys.argv[1:]
    synthetic_n = 50_000
    saw_synthetic_flag = False
    if "--synthetic-n" in argv:
        i = argv.index("--synthetic-n")
        if i + 1 >= len(argv):
            sys.exit("error: --synthetic-n needs a value")
        synthetic_n = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
        saw_synthetic_flag = True
    include_uniform = "--uniform" in argv
    include_uniform_tuned = "--uniform-tuned" in argv
    # --uniform-tuned-only: skip corpus sfs AND the mixture/uniform
    # variants, producing just the worst-case-dial row (for merging
    # into an existing SCALABILITY.json without re-measuring the rest)
    tuned_only = "--uniform-tuned-only" in argv
    if tuned_only:
        include_uniform_tuned = True
    # --grid-only: ONLY the multi-cell grid-shape evidence point for
    # the blocked exact operators at the synthetic design size
    grid_only = "--grid-only" in argv
    # --mixture-only: ONLY the synthetic mixture row at --synthetic-n —
    # the crossover probe (measured at n=200k: MRDF 585.7s < exact
    # 680.7s, the r6 verdict's ask #2; rerun at other n to extend).
    # The r8 "box bound" at n=300k is FIXED (r10): the kernel OOM was
    # _refine's unchunked (pairs_per_block x d) distance tensor —
    # 12-14 GB per task, caught by live RSS sampling and chunked to
    # ~0.8 GB with bit-identical arithmetic (mrdf.py _dist_block).
    # Measured post-fix via --mixture-sampled-only: n=300k MRDF builds
    # + refines in 578 s ON 8 WORKERS at sampled recall 0.9888, where
    # the r8 exhaustive exact scan took 1476.6 s on 32 cores.
    mixture_only = "--mixture-only" in argv
    # --sq8-only: ONLY the quantized-tier evidence row at design size —
    # sq8_search (1-byte/dim codes + integer candidates + rerank) vs
    # the exact grid scan, with measured recall
    sq8_only = "--sq8-only" in argv
    # --serving-only: ONLY the persisted-index serving row — the
    # memory-bound regime (default n=200k, d=512 via --synthetic-d)
    # where the quantized tiers' bytes-moved advantage becomes a
    # measured wall-clock win: exact blocked scan per query batch vs
    # SQ8/IVF-PQ batches served off a train-once persisted index
    serving_only = "--serving-only" in argv
    # --dedup-only: ONLY the text-dedup evidence row — the four
    # measured tiers (exact, MinHash-LSH, substring fingerprint, and
    # SemDeDup over a synthetic embedding set) on planted-duplicate
    # corpora at design size
    dedup_only = "--dedup-only" in argv
    # --pagerank-only: ONLY the link-graph iteration row — 5 rounds of
    # integer fixed-point pagerank (operators/graph.py, q113's kernel)
    # over q113's synthetic citation graph (1 + id%3 out-links) of --synthetic-n nodes
    # (default 2M nodes / 6M edges in this mode)
    pagerank_only = "--pagerank-only" in argv
    # --bq-serving-only: ONLY the binary (1-bit) tier serving row —
    # exact blocked scan vs persisted-SQ8 vs persisted-BQ per query
    # batch at (--synthetic-n, --synthetic-d), with BQ measured at two
    # candidate budgets so the recall/budget dial is in the row
    bq_serving_only = "--bq-serving-only" in argv
    # --graph-serving-only: ONLY the graph-ANN serving row — batched
    # beam search over a prebuilt kNN graph (q124) vs the exact scan
    # for one query batch at (--synthetic-n, --synthetic-d)
    graph_serving_only = "--graph-serving-only" in argv
    # --graph-serving-build mrdf: build the serving graph with
    # knn_graph instead of the exhaustive scan (r10 verdict ask #5) —
    # the row label gains a -mrdf suffix
    graph_serving_build = "exact"
    if "--graph-serving-build" in argv:
        i = argv.index("--graph-serving-build")
        if i + 1 >= len(argv):
            sys.exit("error: --graph-serving-build needs a value (exact|mrdf)")
        graph_serving_build = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
        if graph_serving_build not in ("exact", "mrdf"):
            sys.exit(
                f"error: --graph-serving-build {graph_serving_build!r} "
                "is not one of exact|mrdf"
            )
    # --graph-append-only: ONLY the incremental kNN-graph maintenance
    # row — knn_graph_append (graph tier) folding a 2% batch into an
    # existing MRDF graph vs a full rebuild, sampled-recall protocol
    graph_append_only = "--graph-append-only" in argv
    # --graph-append-chain-only: CHAINED maintenance cycles — C
    # successive 2% batches folded on the operator's OWN rank-carrying
    # output (the zero-shuffle chaining contract), per-cycle wall +
    # sampled recall, one final rebuild comparand: does serving recall
    # DRIFT over repeated appends without a rebuild, and does the
    # per-cycle cost stay batch-proportional as the graph grows?
    graph_append_chain_only = "--graph-append-chain-only" in argv
    # --chain-serve / --chain-retrain-below X: the r13 lifecycle dials
    # of the chain row — final-graph serving at the q124 component
    # default, and the sampled-recall drift monitor wired to a
    # measured mid-chain rebuild (r12 verdict ask #6)
    chain_serve = "--chain-serve" in argv
    chain_retrain_below = None
    if "--chain-retrain-below" in argv:
        i = argv.index("--chain-retrain-below")
        if i + 1 >= len(argv):
            sys.exit("error: --chain-retrain-below needs a value")
        chain_retrain_below = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    # --mixture-sampled-only: ONLY the sampled-recall MRDF design point
    # (default n=300000 — past the full-exact-scan budget; run with
    # SPARK_GRAFT_CPUS=16 per the r8 box-bound note)
    mixture_sampled_only = "--mixture-sampled-only" in argv
    # --ivfpq-io-only: ONLY the IVF-PQ storage-pruning row — on-disk
    # bytes of the probed cells vs the whole cell-partitioned code
    # table, planner PartitionFilters evidence, and pruned-vs-full scan
    # walls at (--synthetic-n default 400k, d=256)
    ivfpq_io_only = "--ivfpq-io-only" in argv
    # --dedup-serving-only: ONLY the persisted-dedup-index serving row —
    # the daily ingest loop (3 batches) run inline (corpus-side LSH
    # state recomputed per batch) vs served off a train-once stored
    # index with survivors appended between batches
    dedup_serving_only = "--dedup-serving-only" in argv
    # --pca-serving-only: ONLY the reduce->quantize->rerank serving row
    # (q133's composition): PCA-d_out + SQ8 candidate index served off
    # frozen params vs full-d persisted SQ8 vs the exact scan, at
    # (--synthetic-n, --synthetic-d)
    pca_serving_only = "--pca-serving-only" in argv
    # --graph-compaction-only: ONLY the compaction read-cost row —
    # stream ≥20 real delta commits onto a graph state, price
    # read_graph_state's overlay + small-files tax, compact, re-price;
    # identity by distributed edge checksum
    graph_compaction_only = "--graph-compaction-only" in argv
    # --rotation-drift-only: ONLY the rotation-aware drift-monitor row
    # (r13 verdict ask #6): build a rotated IVF-PQ index at design
    # size, then rotation_drift_stats on an in-distribution append vs
    # a drifted one — the monitor must FIRE on drift and stay QUIET on
    # the in-distribution batch
    rotation_drift_only = "--rotation-drift-only" in argv
    # --relational-only: ONLY the 10x-sf0.1 relational/events scale
    # point (r10 verdict ask #6) — replicate sf0.1's lineitem/orders/
    # events/part/documents with per-replica key offsets (~6M lineitem,
    # 1M events) and run the headline relational/events queries
    relational_only = "--relational-only" in argv
    relational_factor = 10
    if "--relational-factor" in argv:
        i = argv.index("--relational-factor")
        if i + 1 >= len(argv):
            sys.exit("error: --relational-factor needs a value")
        relational_factor = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    pca_aniso = "--aniso" in argv
    if pca_aniso and not (pca_serving_only or serving_only):
        sys.exit("error: --aniso only applies to --pca-serving-only/--serving-only")
    # --serving-rotate opq: OPQ-lite pre-rotation arm of the serving
    # row (r11 verdict ask #5's second lever) — full-rank PCA basis
    # with eigenvalue-allocation-balanced subspaces applied before the
    # IVF-PQ build and to each query batch; the row label gains a
    # -rotate-opq suffix
    serving_rotate = None
    if "--serving-rotate" in argv:
        i = argv.index("--serving-rotate")
        if i + 1 >= len(argv):
            sys.exit("error: --serving-rotate needs a value (opq)")
        serving_rotate = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
        if serving_rotate != "opq":
            sys.exit(f"error: --serving-rotate {serving_rotate!r} is not opq")
        if not serving_only:
            sys.exit("error: --serving-rotate only applies to --serving-only")
    # --cc-only: ONLY the connected-components row — q72's
    # star-contraction tier over a synthesized chain graph with known
    # components (diameter = chain length, the propagation-hostile
    # shape), correctness asserted against the closed-form ground truth
    cc_only = "--cc-only" in argv
    # --cc-tiers-only: BOTH CC tiers head-to-head on the same chain
    # graph (propagation run to convergence vs star-contraction) — the
    # measurement behind dedup.py:connected_components's tier-choice
    # docstring (synthetic-200000-cc-tiers)
    cc_tiers_only = "--cc-tiers-only" in argv
    # --graph-analytics-only: triangle counting / k-core / label
    # propagation at graph scale over a clique+chain synthesis whose
    # answers are closed-form, so every wall is also a correctness row
    graph_analytics_only = "--graph-analytics-only" in argv
    # --heavy-hitters-only: q137's bounded-shuffle tier vs the plain
    # groupBy on a synthesized high-cardinality stream — identical
    # outputs asserted, both walls recorded
    heavy_hitters_only = "--heavy-hitters-only" in argv
    # --prefix-filter-only: q146's lossless prefix-filtered Jaccard vs
    # the full share-one-shingle join on the planted-duplicate corpus —
    # identical thresholded outputs asserted, walls + join sizes recorded
    prefix_filter_only = "--prefix-filter-only" in argv
    # --incremental-only: q142's maintenance fold vs full recompute at
    # corpus scale with a ~3% CDC delta — equality asserted, walls recorded
    incremental_only = "--incremental-only" in argv
    if pagerank_only and not saw_synthetic_flag:
        synthetic_n = 2_000_000
    if cc_only and not saw_synthetic_flag:
        synthetic_n = 2_000_000
    if cc_tiers_only and not saw_synthetic_flag:
        synthetic_n = 200_000
    if graph_analytics_only and not saw_synthetic_flag:
        synthetic_n = 400_000
    if heavy_hitters_only and not saw_synthetic_flag:
        synthetic_n = 50_000_000
    if prefix_filter_only and not saw_synthetic_flag:
        synthetic_n = 50_000
    if incremental_only and not saw_synthetic_flag:
        synthetic_n = 500_000
    if bq_serving_only and not saw_synthetic_flag:
        synthetic_n = 200_000
    if ivfpq_io_only and not saw_synthetic_flag:
        synthetic_n = 400_000
    if mixture_sampled_only and not saw_synthetic_flag:
        synthetic_n = 300_000
    if graph_append_chain_only and not saw_synthetic_flag:
        synthetic_n = 100_000
    synthetic_d = 512
    saw_d_flag = False
    if "--synthetic-d" in argv:
        i = argv.index("--synthetic-d")
        if i + 1 >= len(argv):
            sys.exit("error: --synthetic-d needs a value")
        synthetic_d = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
        saw_d_flag = True
    # IVF-PQ operating point for --serving-only: recall is bought with
    # coarse-cell granularity (cells/probe at fixed scan fraction),
    # codebook size, and the rerank candidate budget — the three dials
    # a deployment turns per corpus
    serving_ivfpq = {}
    for flag, key in (
        ("--ivfpq-cells", "n_cells"), ("--ivfpq-probe", "n_probe"),
        ("--ivfpq-codes", "n_codes"), ("--ivfpq-cand", "k_cand"),
    ):
        if flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv):
                sys.exit(f"error: {flag} needs a value")
            serving_ivfpq[key] = int(argv[i + 1])
            argv = argv[:i] + argv[i + 2 :]
    argv = [
        a for a in argv
        if a not in (
            "--uniform", "--uniform-tuned", "--uniform-tuned-only", "--grid-only",
            "--mixture-only", "--sq8-only", "--serving-only", "--dedup-only",
            "--pagerank-only", "--bq-serving-only", "--dedup-serving-only",
            "--graph-serving-only", "--graph-append-only", "--graph-append-chain-only", "--chain-serve", "--ivfpq-io-only", "--mixture-sampled-only", "--cc-only", "--cc-tiers-only",
            "--graph-analytics-only", "--heavy-hitters-only",
            "--prefix-filter-only", "--incremental-only",
            "--pca-serving-only", "--relational-only",
            "--rotation-drift-only", "--graph-compaction-only",
            "--aniso",
        )
    ]
    # the -only modes run exactly one section; any other argument or
    # flag would be silently dead — reject those combinations outright
    # (same rule as the sf-list guard below)
    only_modes = [m for m, on in (
        ("--uniform-tuned-only", tuned_only), ("--grid-only", grid_only),
        ("--mixture-only", mixture_only), ("--sq8-only", sq8_only),
        ("--serving-only", serving_only), ("--dedup-only", dedup_only),
        ("--pagerank-only", pagerank_only), ("--bq-serving-only", bq_serving_only),
        ("--dedup-serving-only", dedup_serving_only),
        ("--graph-serving-only", graph_serving_only),
        ("--graph-append-only", graph_append_only),
        ("--graph-append-chain-only", graph_append_chain_only),
        ("--ivfpq-io-only", ivfpq_io_only),
        ("--mixture-sampled-only", mixture_sampled_only),
        ("--cc-only", cc_only),
        ("--cc-tiers-only", cc_tiers_only),
        ("--graph-analytics-only", graph_analytics_only),
        ("--heavy-hitters-only", heavy_hitters_only),
        ("--prefix-filter-only", prefix_filter_only),
        ("--incremental-only", incremental_only),
        ("--pca-serving-only", pca_serving_only),
        ("--rotation-drift-only", rotation_drift_only),
        ("--graph-compaction-only", graph_compaction_only),
        ("--relational-only", relational_only),
    ) if on]
    if only_modes and argv:
        sys.exit("error: the -only modes ignore sf arguments; drop one side")
    # --synthetic-d / --ivfpq-* parameterize ONLY the serving point;
    # anywhere else they'd be consumed and silently dead — the exact
    # wrong-provenance hazard the sf-list guard below rejects (a row
    # measured at the defaults while its flags claim otherwise)
    if saw_d_flag and not (serving_only or bq_serving_only or graph_serving_only or pca_serving_only or ivfpq_io_only or rotation_drift_only or graph_compaction_only):
        sys.exit(
            "error: --synthetic-d only applies to --serving-only/--bq-serving-only/"
            "--graph-serving-only/--pca-serving-only/--ivfpq-io-only/"
            "--rotation-drift-only/--graph-compaction-only; drop the flag or run those modes"
        )
    if ivfpq_io_only:
        # --ivfpq-cells/--ivfpq-probe parameterize the I/O row's coarse
        # granularity (the pruning dial); the other two are serving-only
        dead = [k for k in serving_ivfpq if k not in ("n_cells", "n_probe")]
        if dead:
            sys.exit("error: only --ivfpq-cells/--ivfpq-probe apply to --ivfpq-io-only")
    elif not serving_only and serving_ivfpq:
        flag_of = {
            "n_cells": "--ivfpq-cells", "n_probe": "--ivfpq-probe",
            "n_codes": "--ivfpq-codes", "k_cand": "--ivfpq-cand",
        }
        dead = [flag_of[k] for k in serving_ivfpq]
        sys.exit(
            f"error: {' '.join(dead)} only apply to --serving-only; "
            "drop the flags or run that mode"
        )
    if len(only_modes) > 1:
        sys.exit(f"error: {' and '.join(only_modes)} each run exactly one section; pick one")
    if (grid_only or sq8_only or mixture_only or serving_only or dedup_only or pagerank_only or bq_serving_only or dedup_serving_only or graph_serving_only or graph_append_only or graph_append_chain_only or ivfpq_io_only or mixture_sampled_only or cc_only or cc_tiers_only or graph_analytics_only or heavy_hitters_only or prefix_filter_only or incremental_only or pca_serving_only) and (include_uniform or include_uniform_tuned):
        sys.exit(f"error: {only_modes[0]} runs only its own point; drop the uniform flags")
    if tuned_only and include_uniform:
        sys.exit("error: --uniform-tuned-only runs only the tuned point; drop the other flags")
    sfs = [] if only_modes else (argv or ["sf0.001", "sf0.01", "sf0.1"])
    # explicit sf list = corpus-only run; the synthetic flags would be
    # silently dead in that mode, so reject the combination outright
    run_synthetic = (not argv or tuned_only or mixture_only) and not (
        grid_only or sq8_only or serving_only or dedup_only or pagerank_only
        or bq_serving_only or dedup_serving_only or graph_serving_only
        or graph_append_only or graph_append_chain_only or ivfpq_io_only or mixture_sampled_only
        or cc_only or cc_tiers_only or graph_analytics_only or heavy_hitters_only or prefix_filter_only or incremental_only or pca_serving_only or relational_only
        or rotation_drift_only or graph_compaction_only
    )
    if not (run_synthetic or grid_only or sq8_only or serving_only or dedup_only or pagerank_only or bq_serving_only or dedup_serving_only or graph_serving_only or graph_append_only or graph_append_chain_only or ivfpq_io_only or mixture_sampled_only or cc_only or cc_tiers_only or graph_analytics_only or heavy_hitters_only or prefix_filter_only or incremental_only or pca_serving_only or rotation_drift_only or graph_compaction_only) and (
        include_uniform or include_uniform_tuned or saw_synthetic_flag
    ):
        sys.exit(
            "error: --uniform/--synthetic-n run the synthetic point, which an "
            "explicit sf list disables; drop the sf args or the flags"
        )

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
        g_exact = knn_exact_blocked(emb, K).localCheckpoint(eager=True)
        t_exact = time.time() - t0

        pt = _mrdf_point(spark, emb, sf, rho=4, alpha=600)
        r = recall(g_exact, pt.pop("graph"))

        t0 = time.time()
        flagship.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t_flag = time.time() - t0

        points.append(
            {
                "sf": sf,
                "n": n,
                "knn_exact_s": round(t_exact, 2),
                "mrdf_s": pt["mrdf_s"],
                "mrdf_recall": round(r, 4),
                "flagship_s": round(t_flag, 2),
                "refine_rounds": 1,
            }
        )
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if run_synthetic:
        syn_dir = "/root/repo/.scalability_synth"
        # (name, k_clusters, mrdf overrides): the plain uniform row is
        # hands-free since r11 (auto-escalation reaches 0.9628 from
        # the default dial); --uniform-tuned keeps the explicit
        # 6-forest/2-refine dial for A/B against the escalated run
        variants = [] if tuned_only else [("mixture", 250, {})]
        if include_uniform:
            variants.append(("uniform", None, {}))
        if include_uniform_tuned:
            # auto_escalate=False: this row IS the fixed-dial A/B arm —
            # letting the default escalation double it to 12 forests
            # would measure the wrong schedule
            variants.append((
                "uniform-tuned", None,
                {"max_iter": 6, "refine_rounds": 2, "auto_escalate": False},
            ))
        for dist_name, k_clusters, mrdf_kw in variants:
            try:
                _write_synthetic(syn_dir, synthetic_n, k_clusters=k_clusters)
                emb = spark.read.parquet(os.path.join(syn_dir, "embeddings.parquet"))

                t0 = time.time()
                g_exact = knn_exact_blocked(
                    emb, K, n_blocks=32, n_query_blocks=16
                ).localCheckpoint(eager=True)
                t_exact = time.time() - t0
                print(
                    f"[scalability] exact n={synthetic_n} {dist_name}: {t_exact:.1f}s",
                    file=sys.stderr,
                )

                # one quality-config build activates BOTH scale tiers:
                # α=16384 → leaves in (4096, 32768] (tiled exact kernel),
                # cbmp=0 → every division round through the centroid join
                pt = _mrdf_point(
                    spark, emb, dist_name, rho=4, alpha=16384,
                    centroid_broadcast_max_paths=0, **mrdf_kw,
                )
                max_leaf = max(m.get("max_leaf", 0) for m in pt["metrics"])
                join_rounds = sum(m.get("join_tier_rounds", 0) for m in pt["metrics"])
                assert max_leaf > 4096, (
                    f"tiled-exact leaf tier did not activate: max_leaf={max_leaf}"
                )
                assert join_rounds >= 1, "centroid join tier did not activate"
                r = recall(g_exact, pt.pop("graph"))
                if dist_name != "uniform":
                    assert r >= 0.9, f"design-size recall bar missed: {r}"
                points.append(
                    {
                        "sf": f"synthetic-{synthetic_n}-{dist_name}",
                        "n": synthetic_n,
                        "distribution": dist_name,
                        "knn_exact_s": round(t_exact, 2),
                        "mrdf_s": pt["mrdf_s"],
                        "mrdf_recall": round(r, 4),
                        "refine_rounds": mrdf_kw.get("refine_rounds", 1),
                        "max_iter": mrdf_kw.get("max_iter", 3),
                        # hands-free escalation evidence (r10 verdict
                        # ask #3): forests_run > max_iter + an extra
                        # refine round whenever the free unconverged
                        # signal fired — no hand tuning
                        "forests_run": len(pt["metrics"]),
                        "escalated": bool(
                            any(m.get("escalated") for m in pt["metrics"])
                        ),
                        "alpha": 16384,
                        "max_leaf": int(max_leaf),
                        "join_tier_rounds": int(join_rounds),
                        "tiers": ["tiled_exact_leaves", "distributed_centroid_join"],
                    }
                )
                print(f"[scalability] {points[-1]}", file=sys.stderr)
            finally:
                shutil.rmtree(syn_dir, ignore_errors=True)

    if grid_only:
        points.append(_grid_evidence(spark, synthetic_n))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if sq8_only:
        points.append(_sq8_evidence(spark, synthetic_n))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if serving_only:
        points.append(_serving_evidence(spark, synthetic_n, synthetic_d, rotate=serving_rotate, aniso=pca_aniso, **serving_ivfpq))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if dedup_only:
        points.append(_dedup_evidence(spark, synthetic_n))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if pagerank_only:
        points.append(_pagerank_evidence(spark, synthetic_n))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if bq_serving_only:
        points.append(_bq_serving_evidence(spark, synthetic_n, synthetic_d))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if dedup_serving_only:
        points.append(_dedup_serving_evidence(spark, synthetic_n))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if graph_serving_only:
        points.append(
            _graph_serving_evidence(
                spark, synthetic_n, synthetic_d, build=graph_serving_build
            )
        )
        print(f"[scalability] {points[-1]}", file=sys.stderr)
    if ivfpq_io_only:
        points.append(_ivfpq_io_evidence(spark, synthetic_n, synthetic_d, **serving_ivfpq))
        print(f"[scalability] {points[-1]}", file=sys.stderr)
    if graph_append_only:
        points.append(_graph_append_evidence(spark, synthetic_n))
        print(f"[scalability] {points[-1]}", file=sys.stderr)
    if graph_append_chain_only:
        points.append(_graph_append_chain_evidence(
            spark, synthetic_n, serve=chain_serve,
            retrain_below=chain_retrain_below,
        ))
        print(f"[scalability] {points[-1]}", file=sys.stderr)
    if mixture_sampled_only:
        points.append(_mixture_sampled_evidence(spark, synthetic_n))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if cc_only:
        points.append(_cc_evidence(spark, synthetic_n))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if cc_tiers_only:
        points.append(_cc_tiers_evidence(spark, synthetic_n))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if graph_analytics_only:
        points.append(_graph_analytics_evidence(spark, synthetic_n))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if heavy_hitters_only:
        points.append(_heavy_hitters_evidence(spark, synthetic_n))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if prefix_filter_only:
        points.append(_prefix_filter_evidence(spark, synthetic_n))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if incremental_only:
        points.append(_incremental_evidence(spark, synthetic_n))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if rotation_drift_only:
        points.append(_rotation_drift_evidence(spark, synthetic_n, synthetic_d))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if graph_compaction_only:
        points.append(_graph_compaction_evidence(spark, synthetic_n, synthetic_d))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if pca_serving_only:
        points.append(_pca_serving_evidence(spark, synthetic_n, synthetic_d, aniso=pca_aniso))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    if relational_only:
        points.append(_relational_evidence(spark, relational_factor))
        print(f"[scalability] {points[-1]}", file=sys.stderr)

    print(json.dumps({"metric": "scalability_sweep", "points": points}))


def _relational_evidence(spark, factor: int = 10) -> dict:
    """The relational surface's first beyond-sf0.1 evidence (r10
    verdict ask #6): replicate sf0.1's fact tables ``factor``× with
    per-replica KEY OFFSETS — every replica keeps a disjoint key space,
    so join fan-outs, group cardinalities, and window partition sizes
    scale the way a real 10× corpus would (same per-key row counts,
    ``factor``× more keys; dims like part scale with their pk) — then
    run the headline relational/events queries cold and record
    per-query seconds + output rows. No assertions beyond completion:
    the row IS the would-the-plan-survive-10× measurement."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    base = "/root/testdata/sf0.1"
    syn = "/root/repo/.scalability_synth_rel"
    # Referential integrity across replicas: l_partkey is offset by the
    # PART table's pk span (not lineitem's own column span), so replica
    # i's lineitems reference replica i's parts exactly. p_name gets a
    # per-replica suffix so NAME-keyed operators (q153's linkage joins)
    # see factor-x more distinct entities, not factor-x duplicates of
    # each entity (duplicated names would blow candidate-pair work up
    # ~factor^2 and misrepresent the 10x cost).
    part_pk = pq.read_table(
        os.path.join(base, "part.parquet"), columns=["p_partkey"]
    )
    part_span = pc.max(part_pk["p_partkey"]).as_py() + 1
    # l_orderkey must shift by the ORDERS pk span (not lineitem's own
    # column span) for the same reason as l_partkey/part_span above:
    # the two maxima coincide in today's sf0.1 data, but a corpus with
    # trailing orders that have no lineitems would desynchronize the
    # replicas' foreign keys (advisor r11).
    orders_pk = pq.read_table(
        os.path.join(base, "orders.parquet"), columns=["o_orderkey"]
    )
    order_span = pc.max(orders_pk["o_orderkey"]).as_py() + 1
    offsets: dict[str, dict] = {
        "lineitem": {"l_orderkey": order_span, "l_partkey": part_span},
        "orders": {"o_orderkey": order_span},
        "events": {"event_id": None, "user_id": None},
        "part": {"p_partkey": part_span},
        "documents": {"doc_id": None},
    }
    suffix_cols = {"part": ["p_name"]}
    out: dict = {
        "sf": f"relational-{factor}x-sf0.1",
        "factor": factor,
        "rows": {},
        "queries": {},
    }
    try:
        shutil.rmtree(syn, ignore_errors=True)
        os.makedirs(syn)
        for tname, keys in offsets.items():
            t = pq.read_table(os.path.join(base, f"{tname}.parquet"))
            span = {
                k: (s if s is not None else pc.max(t[k]).as_py() + 1)
                for k, s in keys.items()
            }
            sfx = suffix_cols.get(tname, [])
            reps = []
            for i in range(factor):
                cols = {}
                for name in t.column_names:
                    col = t[name]
                    if i and name in span:
                        col = pc.add(col, i * span[name])
                    elif i and name in sfx:
                        col = pc.binary_join_element_wise(
                            pc.cast(col, pa.string()), f" r{i}", ""
                        )
                    cols[name] = col
                reps.append(pa.table(cols))
            big = pa.concat_tables(reps)
            pq.write_table(big, os.path.join(syn, f"{tname}.parquet"))
            out["rows"][tname] = big.num_rows

        from pyspark_mrdf_spark.queries import load_all

        specs = load_all()
        for qname in (
            "q01_pricing_summary",
            "q114_scd2_history",
            "q130_linear_attribution",
            "q135_top_user_paths",
            "q149_hourly_gap_fill",
            "q150_hourly_rate_spikes",
            "q151_trailing_range_window",
            "q152_user_key_skew_profile",
            "q153_golden_record",
            "q154_upsert_merge_stats",
        ):
            t0 = time.time()
            n_rows = specs[qname].builder(spark, syn).count()
            out["queries"][qname] = {
                "s": round(time.time() - t0, 2),
                "rows": int(n_rows),
            }
            print(
                f"[scalability] {qname}: {out['queries'][qname]}",
                file=sys.stderr,
            )
        if factor >= 20:
            _linkage_cap_probe(spark, syn, out)
    finally:
        shutil.rmtree(syn, ignore_errors=True)
    return out


def _linkage_cap_probe(spark, syn: str, out: dict) -> None:
    """The blocked-levenshtein growth probe (r11 verdict ask #7):
    candidate-pair mass is Σ_blocks |dirty|·|clean| per key, and the
    replication shape makes PREFIX blocks cross-replica (every replica
    of a name shares its first 3 chars → quadratic in factor) while
    SUFFIX blocks stay replica-local (the ' r{i}' name suffix → linear
    in factor). Measures one q139-shaped feed uncapped vs capped with
    ``max_block = 3·median clean block size`` (the non-discriminative-
    key rule: typical blocks are fine, the stoplist only drops keys
    far above typical), recording wall, block-size stats, and the
    match-agreement fraction — the honest recall cost of the cap."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.io import load_table
    from pyspark_mrdf_spark.operators.linkage import blocked_levenshtein_link

    p = load_table(spark, syn, "part").localCheckpoint(eager=True)
    clean = p.select("p_name")
    corrupt = (
        "concat(substring(p_name, 1, cast(p_partkey % length(p_name) as int)), "
        "substring(p_name, cast(p_partkey % length(p_name) as int) + 2))"
    )
    dirty = p.filter(F.col("p_partkey") % 3 == 1).select(
        F.col("p_partkey").alias("rec_id"), F.expr(corrupt).alias("name")
    ).localCheckpoint(eager=True)

    # clean-side block-size distribution (the dial's evidence): replay
    # the operator's own keying — prefix + positive-arithmetic suffix
    names = clean.select(F.col("p_name").alias("_cn")).distinct()
    keys = names.select(
        F.explode(
            F.array(
                F.substring("_cn", 1, 3),
                F.expr("substring(_cn, greatest(length(_cn) - 2, 1), 3)"),
            )
        ).alias("_k")
    )
    sizes = keys.groupBy("_k").count()
    med, mx = sizes.agg(
        F.expr("percentile_approx(count, 0.5)"), F.max("count")
    ).collect()[0]
    max_block = int(3 * med)
    out["linkage_block_median"] = int(med)
    out["linkage_block_max"] = int(mx)
    out["linkage_max_block"] = max_block

    t0 = time.time()
    full = blocked_levenshtein_link(
        dirty, clean, clean_name_col="p_name", max_block=None
    ).localCheckpoint(eager=True)
    n_full = full.count()
    out["linkage_uncapped_s"] = round(time.time() - t0, 2)
    out["linkage_matches_uncapped"] = int(n_full)
    # the r14 DEFAULT dial (max_block="auto"): cap derived from the
    # clean side's own block-size distribution, split action — the
    # wall q139/q153 now pay with NO hand dial, agreement 1.0 by law
    t0 = time.time()
    auto = blocked_levenshtein_link(
        dirty, clean, clean_name_col="p_name"
    ).localCheckpoint(eager=True)
    n_auto = auto.count()
    out["linkage_auto_s"] = round(time.time() - t0, 2)
    agree_auto = full.join(
        auto, ["rec_id", "matched_name"], "left_semi"
    ).count()
    out["linkage_matches_auto"] = int(n_auto)
    out["linkage_auto_agreement"] = round(agree_auto / max(n_full, 1), 4)
    # both hot-block actions against the same uncapped comparand: the
    # r12 stoplist ('drop', measured 0.873 agreement at 30×) vs the r13
    # deletion-neighborhood SPLIT, whose law is agreement 1.0 at a wall
    # still bounded by sub-block (match-density) pair mass
    for action in ("split", "drop"):
        t0 = time.time()
        capped = blocked_levenshtein_link(
            dirty, clean, clean_name_col="p_name", max_block=max_block,
            hot_block_action=action,
        ).localCheckpoint(eager=True)
        n_capped = capped.count()
        out[f"linkage_{action}_s"] = round(time.time() - t0, 2)
        agree = full.join(
            capped, ["rec_id", "matched_name"], "left_semi"
        ).count()
        out[f"linkage_matches_{action}"] = int(n_capped)
        out[f"linkage_{action}_agreement"] = round(agree / max(n_full, 1), 4)
    print(
        "[scalability] linkage cap probe: "
        f"uncapped {out['linkage_uncapped_s']}s "
        f"split {out['linkage_split_s']}s (agreement "
        f"{out['linkage_split_agreement']}) "
        f"drop {out['linkage_drop_s']}s (agreement "
        f"{out['linkage_drop_agreement']})",
        file=sys.stderr,
    )


def _rotation_drift_evidence(spark, n: int, d: int = 64) -> dict:
    """The rotation-aware drift monitor, measured (r13 verdict ask #6):
    build a rotate='opq' IVF-PQ index on a mixture corpus, then run
    ``rotation_drift_stats`` on (a) an IN-DISTRIBUTION append — fresh
    noise from the same mixture (same seed → same centers; the batch is
    the tail slice of a longer draw) — and (b) a DRIFTED append (the
    same rows through an affine shift). Claim under test: the monitor
    fires on drift and stays quiet in distribution, at O(batch +
    d-aggregate) cost. Quiet is not zero: a sample envelope is crossed
    by out-of-sample rows at ~2/sample_size per dim per row — the row
    records both levels so the dial (dims with viol_e6 > 50k, i.e. >5%
    of the batch outside the envelope on that rotated dim) is evidence,
    not assertion."""
    import tempfile

    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.quantize import (
        build_ivfpq_index,
        rotation_drift_stats,
    )

    m = max(1000, n // 50)
    syn = tempfile.mkdtemp(prefix="rotdrift_")
    out: dict = {"sf": f"synthetic-{n}x{d}-rotation-drift", "n": n, "batch": m}
    try:
        _write_synthetic(os.path.join(syn, "all"), n + m, d=d)
        allv = spark.read.parquet(os.path.join(syn, "all", "embeddings.parquet"))
        corpus = allv.filter(F.col("vec_id") < n).localCheckpoint(eager=True)
        batch = allv.filter(F.col("vec_id") >= n).localCheckpoint(eager=True)
        idx = os.path.join(syn, "idx")
        t0 = time.time()
        metrics: dict = {}
        build_ivfpq_index(
            corpus, idx, n_centroids=64, n_subspaces=8, n_codes=16,
            sample_size=4096, rotate="opq", metrics_out=metrics,
        )
        out["index_build_s"] = round(time.time() - t0, 2)
        out["rotation_train_s"] = metrics.get("rotation_train_s")

        def monitor(b):
            t0 = time.time()
            rows = rotation_drift_stats(b, idx).collect()
            v = sorted(r["viol_e6"] for r in rows)
            return {
                "monitor_s": round(time.time() - t0, 2),
                "viol_e6_max": int(v[-1]),
                "viol_e6_median": int(v[len(v) // 2]),
                "dims_over_5pct": sum(1 for x in v if x > 50_000),
                "n_dims": len(v),
            }

        out["in_distribution"] = monitor(batch)
        drifted = batch.select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> cast(x * 1.5 + 3.0 as float))"
            ).alias("embedding"),
        )
        out["drifted"] = monitor(drifted)
        out["fires_on_drift_only"] = (
            out["drifted"]["dims_over_5pct"] > 0
            and out["in_distribution"]["dims_over_5pct"] == 0
        )
        print(
            "[scalability] rotation drift: quiet "
            f"{out['in_distribution']} vs drifted {out['drifted']}",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(syn, ignore_errors=True)
    return out


def _graph_compaction_evidence(
    spark, n: int, d: int = 64, k: int = 8, n_batches: int = 24
) -> dict:
    """Per-batch read cost before/after ``compact_graph_state`` at
    ≥20 committed deltas (r13 verdict ask #3's measurement half).
    The claim: ``read_graph_state`` pays a latest-wins overlay join
    plus a many-small-files scan LINEAR in committed delta count, and
    compaction returns both to one base scan — row-identically
    (the law tests prove identity; this row prices it). The deltas
    are REAL stream commits: ``graph_append_stream`` over an ndjson
    source at maxFilesPerTrigger=1, exactly the lifecycle deployments
    run. Read cost = read_graph_state + a count that forces the
    overlay, median of 3; identity check = distributed edge-checksum
    equality (no corpus-sized collect)."""
    import tempfile

    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.similarity import knn_exact_blocked
    from pyspark_mrdf_spark.streaming.ingest import (
        compact_graph_state,
        graph_append_stream,
        read_graph_state,
        write_graph_state,
    )

    batch = max(200, n // 40)
    syn = tempfile.mkdtemp(prefix="gcompact_")
    out: dict = {
        "sf": f"synthetic-{n}x{d}-graph-compaction",
        "n_base": n, "batch": batch, "n_batches": n_batches, "k": k,
    }
    try:
        total = n + n_batches * batch
        _write_synthetic(os.path.join(syn, "all"), total, d=d)
        allv = spark.read.parquet(os.path.join(syn, "all", "embeddings.parquet"))
        base = allv.filter(F.col("vec_id") < n).localCheckpoint(eager=True)
        t0 = time.time()
        g0 = knn_exact_blocked(base, k, n_blocks=16).localCheckpoint(eager=True)
        out["base_build_s"] = round(time.time() - t0, 2)
        state = os.path.join(syn, "state")
        write_graph_state(base, g0, state)

        # ndjson batch files — one stream trigger each
        src_dir = os.path.join(syn, "vecs")
        os.makedirs(src_dir)
        pdf = (
            allv.filter(F.col("vec_id") >= n)
            .orderBy("vec_id")
            .toPandas()
        )
        for b in range(n_batches):
            rows = pdf.iloc[b * batch : (b + 1) * batch]
            with open(os.path.join(src_dir, f"b{b:03d}.json"), "w") as f:
                for _, r in rows.iterrows():
                    f.write(
                        '{"vec_id": %d, "embedding": [%s]}\n'
                        % (r["vec_id"], ",".join(str(float(x)) for x in r["embedding"]))
                    )
        s = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .json(src_dir)
        )
        t0 = time.time()
        q = graph_append_stream(
            s, state, os.path.join(syn, "ckpt"), k, mode="graph",
            query_name="gcompact_probe",
        )
        q.awaitTermination(3600)
        out["stream_total_s"] = round(time.time() - t0, 2)
        out["stream_per_batch_s"] = round(out["stream_total_s"] / n_batches, 2)

        import glob as _glob

        def read_cost(path):
            walls = []
            checksum = None
            n_edges = None
            for _ in range(3):
                t0 = time.time()
                _, graph = read_graph_state(spark, path)
                agg = graph.agg(
                    F.count("*").alias("n"),
                    F.sum(
                        F.xxhash64("src", "dst", "rnk").cast("decimal(38,0)")
                    ).alias("chk"),
                ).collect()[0]
                walls.append(time.time() - t0)
                checksum, n_edges = int(agg["chk"]), int(agg["n"])
            walls.sort()
            return round(walls[1], 2), n_edges, checksum

        out["deltas_committed"] = len(
            _glob.glob(os.path.join(state, "graph/stream/batch=*"))
        )
        out["delta_files"] = len(
            _glob.glob(os.path.join(state, "graph/stream/batch=*/*.parquet"))
        ) + len(_glob.glob(os.path.join(state, "corpus/stream/batch=*/*.parquet")))
        w, n_edges, chk = read_cost(state)
        out["read_s_with_deltas"] = w
        compacted = os.path.join(syn, "state_compacted")
        t0 = time.time()
        compact_graph_state(spark, state, compacted)
        out["compact_s"] = round(time.time() - t0, 2)
        w2, n_edges2, chk2 = read_cost(compacted)
        out["read_s_compacted"] = w2
        out["read_speedup"] = round(w / max(w2, 1e-9), 2)
        out["edges"] = n_edges
        out["row_identical"] = bool(n_edges == n_edges2 and chk == chk2)
        print(
            f"[scalability] compaction: {out['deltas_committed']} deltas, "
            f"read {w} s -> {w2} s ({out['read_speedup']}x), "
            f"identical={out['row_identical']}",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(syn, ignore_errors=True)
    return out


def _pca_serving_evidence(spark, n: int, d: int, d_out: int = 16, aniso: bool = False) -> dict:
    """q133's composition at serving scale: REDUCE (PCA d->d_out) +
    QUANTIZE (SQ8 on the rotated space, d_out B/row — d*8/d_out x below
    the float64 working set) + exact rerank on original vectors, served
    off FROZEN params, vs full-d persisted SQ8 and the exact scan on
    the same batches. The composition's candidate scan reads d_out/d of
    full-SQ8's bytes and runs d_out/d of its gemm flops — the row
    measures whether that shows up at the wall."""
    import tempfile

    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.project import pca_project_vec, pca_train
    from pyspark_mrdf_spark.operators.quantize import (
        _rerank_exact,
        build_sq8_index,
        read_sq8_index,
        sq8_candidates,
        sq8_encode,
        sq8_range_weights,
        sq8_search_encoded,
        sq8_train,
    )
    from pyspark_mrdf_spark.operators.similarity import knn_search_blocked

    syn_dir = "/root/repo/.scalability_synth_pca_serving"
    batch_size = 2_000
    n_batches = 3
    # per-tier candidate budgets: each tier gets what its recall needs
    # (the dial is the budget) — full-d SQ8 reaches ~1.0 at 4K on the
    # mixture, the 16-dim rotated space needs more headroom
    sq8_k_cand = 4 * K
    pca_k_cand = 16 * K
    out: dict = {
        "sf": f"synthetic-{n}x{d}-pca-serving" + ("-aniso" if aniso else ""),
        "n": n, "d": d, "spectrum": "decaying" if aniso else "flat",
        "d_out": d_out, "batch_size": batch_size, "n_batches": n_batches,
        "sq8_k_candidates": sq8_k_cand, "pca_k_candidates": pca_k_cand,
    }
    try:
        _write_synthetic(syn_dir, n, d=d, aniso=aniso)
        emb = spark.read.parquet(os.path.join(syn_dir, "embeddings.parquet"))
        emb = emb.localCheckpoint(eager=True)
        dp = spark.sparkContext.defaultParallelism

        def _noop(batches):
            yield from batches

        spark.range(0, dp * 100, 1, dp).mapInPandas(_noop, "id long").count()

        batches = [
            emb.filter(
                (F.col("vec_id") >= i * batch_size)
                & (F.col("vec_id") < (i + 1) * batch_size)
            )
            for i in range(n_batches)
        ]

        def _timed(build):
            t0 = time.time()
            g = build().localCheckpoint(eager=True)
            return g, round(time.time() - t0, 2)

        exact_s, exact_g = [], None
        for i, q in enumerate(batches):
            g, dt = _timed(
                lambda: knn_search_blocked(
                    q, emb, K, n_blocks=32, n_query_blocks=8, include_self=False
                )
            )
            exact_s.append(dt)
            if i == 0:
                exact_g = g
        out["exact_batch_s"] = exact_s

        # full-d persisted SQ8 baseline
        idx_root = tempfile.mkdtemp(prefix="mrdf_pca_serving_idx_")
        t0 = time.time()
        build_sq8_index(emb, os.path.join(idx_root, "sq8"))
        out["sq8_index_build_s"] = round(time.time() - t0, 2)
        mn_f, mx_f, codes_f = read_sq8_index(spark, os.path.join(idx_root, "sq8"))
        codes_f = codes_f.localCheckpoint(eager=True)
        sq8_s, sq8_g = [], None
        for i, q in enumerate(batches):
            g, dt = _timed(
                lambda: sq8_search_encoded(
                    q, codes_f, mn_f, mx_f, emb, K,
                    k_candidates=sq8_k_cand, include_self=False,
                )
            )
            sq8_s.append(dt)
            if i == 0:
                sq8_g = g
        out["sq8_batch_s"] = sq8_s
        out["sq8_recall"] = round(recall(exact_g, sq8_g), 4)
        out["sq8_index_bytes_per_row"] = d + 8

        if aniso:
            # range-weighted code distance (sq8_range_weights): the fix
            # for exactly this spectrum, same index bytes, same budget
            sq8w_s, sq8w_g = [], None
            for i, q in enumerate(batches):
                g, dt = _timed(
                    lambda: sq8_search_encoded(
                        q, codes_f, mn_f, mx_f, emb, K,
                        k_candidates=sq8_k_cand, include_self=False,
                        weighted=True,
                    )
                )
                sq8w_s.append(dt)
                if i == 0:
                    sq8w_g = g
            out["sq8_weighted_batch_s"] = sq8w_s
            out["sq8_weighted_recall"] = round(recall(exact_g, sq8w_g), 4)

        # reduce->quantize composition: train once, serve many
        t0 = time.time()
        mean, comp = pca_train(emb, d_out)
        cp = pca_project_vec(emb, mean, comp).localCheckpoint(eager=True)
        mn_p, mx_p = sq8_train(cp)
        codes_p = sq8_encode(cp, mn_p, mx_p).localCheckpoint(eager=True)
        out["pca_sq8_index_build_s"] = round(time.time() - t0, 2)
        pca_s, pca_g = [], None
        for i, q in enumerate(batches):
            def _serve(q=q):
                qp = pca_project_vec(q, mean, comp)
                # weighted: the projected space is anisotropic by
                # construction (pca_sq8_search's shipped default)
                cand = sq8_candidates(
                    qp, codes_p, pca_k_cand, mn_p, mx_p, include_self=False,
                    dim_weights=sq8_range_weights(mn_p, mx_p),
                ).select("src", "dst")
                return _rerank_exact(cand, q, emb, K, "vec_id", "embedding")
            g, dt = _timed(_serve)
            pca_s.append(dt)
            if i == 0:
                pca_g = g
        out["pca_sq8_batch_s"] = pca_s
        out["pca_sq8_recall"] = round(recall(exact_g, pca_g), 4)
        out["pca_sq8_index_bytes_per_row"] = d_out + 8
    finally:
        shutil.rmtree(syn_dir, ignore_errors=True)
    return out


def _cc_evidence(spark, n: int) -> dict:
    """Connected components at graph scale (q72's star-contraction tier,
    operators/dedup.py:connected_components_star): n nodes in chains of
    length 100 — ground truth cluster = floor(id/100)·100, and diameter
    100 is the propagation-hostile shape that motivates the tier (plain
    min-label propagation needs diameter rounds; large-star/small-star
    needs O(log²) — Kiveris et al. 2014). Correctness asserted exactly
    against the closed form, so the row is evidence, not just a wall."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.dedup import connected_components_star

    chain = 100
    nodes = spark.range(n)
    edges = (
        # the id < n-1 guard keeps the last (partial) chain from
        # emitting an edge to the nonexistent node n when n % chain != 0
        nodes.filter(((F.col("id") % chain) != chain - 1) & (F.col("id") < n - 1))
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    t0 = time.time()
    cc = connected_components_star(edges).localCheckpoint(eager=True)
    wall = time.time() - t0
    wrong = cc.filter(
        F.col("cluster_id") != (F.col("doc_id") - F.col("doc_id") % chain)
    ).count()
    n_clusters = cc.select("cluster_id").distinct().count()
    return {
        "sf": f"synthetic-{n}-cc", "n_nodes": n, "chain_len": chain,
        "n_edges": n_edges, "cc_star_s": round(wall, 2),
        "clusters": n_clusters,
        # components that HAVE edges (CC labels only edge-touched
        # nodes): every full-or-partial chain of >= 2 nodes; a trailing
        # singleton (n % chain == 1) never appears in the pair graph
        "expected_clusters": (n + chain - 1) // chain - (1 if n % chain == 1 else 0),
        "wrong_labels": wrong,
        "note": (
            "star-contraction CC over 20k chains of length 100: every "
            "label verified against the closed-form ground truth "
            "(wrong_labels must be 0); the dedup-clustering step (q72) "
            "at the scale where pair graphs come out of a 100 TB LSH "
            "pass"
        ),
    }


def _cc_tiers_evidence(spark, n: int) -> dict:
    """Both CC tiers head-to-head on the identical chain graph (the
    measurement cited by operators/dedup.py:connected_components's
    tier-choice docstring): min-label propagation run to convergence
    (max_iter = chain+1 so it cannot fall through to star) vs
    large-star/small-star contraction. Diameter = chain length 100 is
    the propagation-hostile shape; both results are asserted exactly
    against the closed-form ground truth, so the walls compare equal
    work, not differing answers."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    chain = 100
    nodes = spark.range(n)
    edges = (
        nodes.filter(((F.col("id") % chain) != chain - 1) & (F.col("id") < n - 1))
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    out: dict = {
        "sf": f"synthetic-{n}-cc-tiers", "n_nodes": n, "chain_len": chain,
        "n_edges": n_edges,
    }
    truth = F.col("cluster_id") != (F.col("doc_id") - F.col("doc_id") % chain)
    t0 = time.time()
    prop = connected_components(edges, max_iter=chain + 1).localCheckpoint(eager=True)
    out["cc_propagation_s"] = round(time.time() - t0, 2)
    out["propagation_wrong_labels"] = prop.filter(truth).count()
    t0 = time.time()
    star = connected_components_star(edges).localCheckpoint(eager=True)
    out["cc_star_s"] = round(time.time() - t0, 2)
    out["star_wrong_labels"] = star.filter(truth).count()
    out["note"] = (
        "tier choice head-to-head at diameter 100: propagation pays one "
        "join round per diameter step, star contracts in O(log^2) "
        "rounds; both exact (wrong_labels must be 0). Near-dup clique "
        "graphs (diameter <= ~3) invert the comparison, which is why "
        "propagation stays the default tier."
    )
    return out


def _incremental_evidence(spark, n: int) -> dict:
    """q142's maintenance fold vs full recompute at corpus scale.

    Production shape: the maintained per-source stats table exists
    (one historical build, timed separately), and the refresh receives
    a CDC DELTA — here ~3% churn (1-in-33 removals, 1-in-37 in-place
    edits, 2% additions) whose payload rows carry the changed text.
    The fold tokenizes DELTA docs only and folds signed sums into the
    stored aggregate; the recompute tokenizes the whole post-churn
    corpus. Equality of the two results is asserted exactly — the same
    maintenance-equals-recompute law q142's oracle pins at sf."""
    from pyspark.sql import functions as F

    syn_dir = "/root/repo/.scalability_synth_incr"
    out: dict = {"sf": f"synthetic-{n}-incremental", "n_docs": n}
    try:
        _write_synthetic_docs(syn_dir, n)
        d = spark.read.parquet(os.path.join(syn_dir, "documents.parquet"))
        d = d.repartition(2 * spark.sparkContext.defaultParallelism)
        d = d.localCheckpoint(eager=True)
        ntok = F.size(F.split(F.col("text"), " "))

        t0 = time.time()
        stored = (
            d.groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(ntok).cast("long").alias("n_tokens"),
            )
            .localCheckpoint(eager=True)
        )
        stored.count()
        out["initial_build_s"] = round(time.time() - t0, 2)

        removed = d.filter(F.col("doc_id") % 33 == 0)
        # disjoint from removals (a doc removed AND edited would double-count)
        edited = d.filter((F.col("doc_id") % 37 == 1) & (F.col("doc_id") % 33 != 0))
        added = d.filter(F.col("doc_id") % 50 == 2).select(
            (-F.col("doc_id") - 1).alias("doc_id"),
            F.concat(F.lit("NEW "), F.col("text")).alias("text"),
            "lang", "source", "n_chars",
        )
        # the post-churn corpus, materialized so the recompute pays
        # only its own scan+tokenize, not the churn derivation
        b = (
            d.join(
                removed.select("doc_id").unionByName(edited.select("doc_id")),
                "doc_id",
                "left_anti",
            )
            .unionByName(
                edited.select(
                    "doc_id",
                    F.concat(F.col("text"), F.lit(" [rev2]")).alias("text"),
                    "lang", "source", "n_chars",
                )
            )
            .unionByName(added)
        )
        # both refresh paths read from STORAGE, as deployed: the
        # maintained-table pattern exists because the corpus lives in
        # parquet, not executor RAM — a RAM-checkpointed recompute
        # measured 1.4 s at n=500k, which is the fixed job overhead,
        # not the scan the pattern avoids
        b_path = os.path.join(syn_dir, "snapshot_b.parquet")
        b.write.mode("overwrite").parquet(b_path)
        b = spark.read.parquet(b_path)
        out["n_docs_after"] = b.count()
        # CDC payload rows (changed docs only), materialized: at refresh
        # time these ARRIVE as the change feed — deriving them is the
        # upstream CDC system's cost, not the fold's
        delta_docs = (
            removed.select("source", F.lit(-1).alias("dd"), (-ntok).alias("dt"))
            .unionByName(
                edited.select(
                    "source",
                    F.lit(0).alias("dd"),
                    # edit delta: " [rev2]" appends exactly one token
                    F.lit(1).alias("dt"),
                )
            )
            .unionByName(added.select("source", F.lit(1).alias("dd"), ntok.alias("dt")))
        )
        delta_path = os.path.join(syn_dir, "delta.parquet")
        delta_docs.write.mode("overwrite").parquet(delta_path)
        delta_docs = spark.read.parquet(delta_path)
        out["n_delta_rows"] = delta_docs.count()

        t0 = time.time()
        folded = (
            stored.join(
                delta_docs.groupBy("source").agg(
                    F.sum("dd").alias("dd"), F.sum("dt").alias("dt")
                ),
                "source",
                "left",
            )
            .select(
                "source",
                (F.col("n_docs") + F.coalesce(F.col("dd"), F.lit(0)))
                .cast("long")
                .alias("n_docs"),
                (F.col("n_tokens") + F.coalesce(F.col("dt"), F.lit(0)))
                .cast("long")
                .alias("n_tokens"),
            )
            .localCheckpoint(eager=True)
        )
        folded.count()
        out["incremental_fold_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        recomputed = (
            b.groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(ntok).cast("long").alias("n_tokens"),
            )
            .localCheckpoint(eager=True)
        )
        recomputed.count()
        out["full_recompute_s"] = round(time.time() - t0, 2)

        f_rows = {tuple(r) for r in folded.collect()}
        r_rows = {tuple(r) for r in recomputed.collect()}
        out["mismatch"] = len(f_rows ^ r_rows)
        assert out["mismatch"] == 0
        out["note"] = (
            "maintenance fold vs full recompute with a ~3% CDC delta "
            "(1-in-33 removals, 1-in-37 single-token edits, 2% adds): "
            "results asserted identical (mismatch must be 0); the fold "
            "aggregates delta rows only, the recompute re-tokenizes the "
            "whole post-churn corpus — the don't-rescan-100TB-for-3%-churn "
            "claim as two measured walls"
        )
    finally:
        import shutil

        shutil.rmtree(syn_dir, ignore_errors=True)
    return out


def _prefix_filter_evidence(spark, n: int) -> dict:
    """q146's lossless prefix filter vs the full posting self-join on
    the planted-duplicate corpus (the same synthesis the dedup rows
    use): identical thresholded pair sets asserted, both walls and the
    shuffled-pair volumes recorded."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )

    import hashlib

    syn_dir = "/root/repo/.scalability_synth_prefix"
    t_e2 = 80
    out: dict = {"sf": f"synthetic-{n}-prefix-filter", "n_docs": n, "threshold_e2": t_e2}
    try:
        _write_synthetic_docs(syn_dir, n)
        base = spark.read.parquet(os.path.join(syn_dir, "documents.parquet"))
        base = base.repartition(2 * spark.sparkContext.defaultParallelism)
        base = base.localCheckpoint(eager=True)
        # "boilerplate" variant: 25% of docs share a fixed 14-word
        # passage — the real-web shape (cookie banners, license
        # footers routinely hit a quarter of a crawl) whose hot
        # shingles give the full posting join its df² fan-out; the
        # prefix filter ranks exactly those shingles LAST per doc, so
        # they never join
        passage = " ".join(
            hashlib.md5(f"bp{i}".encode()).hexdigest()[:8] for i in range(14)
        )
        bp = base.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.col("text"), F.lit(" " + passage)),
            ).otherwise(F.col("text")),
        ).localCheckpoint(eager=True)
        bp.count()

        for label, d in (("uniform", base), ("boilerplate", bp)):
            t0 = time.time()
            full = (
                jaccard_pairs(d)
                .filter(F.col("jaccard") * 100 >= t_e2)
                .localCheckpoint(eager=True)
            )
            full_rows = {
                (r["doc_a"], r["doc_b"], r["inter"]) for r in full.collect()
            }
            out[f"{label}_full_join_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            pref = jaccard_pairs_prefix(d, threshold_e2=t_e2).localCheckpoint(
                eager=True
            )
            pref_rows = {
                (r["doc_a"], r["doc_b"], r["inter"]) for r in pref.collect()
            }
            out[f"{label}_prefix_filter_s"] = round(time.time() - t0, 2)
            out[f"{label}_pairs"] = len(pref_rows)
            out[f"{label}_mismatch"] = len(full_rows ^ pref_rows)
            assert out[f"{label}_mismatch"] == 0
        out["note"] = (
            "lossless prefix filtering (q146) vs the full share-one-shingle "
            "join at jaccard >= 0.8, identical pair sets asserted on BOTH "
            "corpora (mismatch must be 0). The uniform random-vocab corpus "
            "(df~1 everywhere) is the full join's best case — no fan-out to "
            "save, and the prefix tier's df-rank window is pure overhead; "
            "the boilerplate corpus (10% of docs share one passage — the "
            "real-web shape) gives the full join its df-squared blowup "
            "while the prefix tier ranks the hot shingles last per doc and "
            "never joins them. The tier is the default for web text, not "
            "for synthetic-unique corpora"
        )
    finally:
        import shutil

        shutil.rmtree(syn_dir, ignore_errors=True)
    return out


def _heavy_hitters_evidence(spark, n: int) -> dict:
    """q137's bounded-shuffle heavy-hitter tier vs the plain groupBy on
    a synthesized stream whose key cardinality is ~70% of row count —
    the 13-gram regime where map-side combine stops combining.

    Stream (pure spark.range arithmetic): 30% of rows spread over 5
    hot keys (each exactly 6% of rows, strictly over the N/k = 5% bar
    at k=20 — the hot-key index uses (id div 10) % 5 so it is
    independent of the id % 10 < 3 hot/tail split), 70% carry their
    own unique key. Both plans must return the identical hot-key set
    with identical exact counts; both walls are recorded."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.sketch import heavy_hitters

    k = 20
    items = spark.range(n).select(
        F.when(
            F.col("id") % 10 < 3,
            F.concat(F.lit("hot"), F.expr("(id div 10) % 5")),
        )
        .otherwise(F.concat(F.lit("u"), F.col("id")))
        .alias("token")
    ).localCheckpoint(eager=True)
    out: dict = {
        "sf": f"synthetic-{n}-heavy-hitters", "n_rows": n, "k": k,
        "n_distinct_approx": int(0.7 * n) + 5,
    }
    t0 = time.time()
    full = (
        items.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > n)
        .localCheckpoint(eager=True)
    )
    full_rows = {(r["token"], r["cnt"]) for r in full.collect()}
    out["groupby_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    hh = heavy_hitters(items, "token", k).localCheckpoint(eager=True)
    hh_rows = {(r["token"], r["cnt"]) for r in hh.collect()}
    out["sketch_tier_s"] = round(time.time() - t0, 2)
    out["hot_keys"] = len(hh_rows)
    out["mismatch"] = len(full_rows ^ hh_rows)
    assert out["mismatch"] == 0 and out["hot_keys"] == 5
    out["note"] = (
        "identical exact outputs asserted (mismatch must be 0). The "
        "groupBy shuffles one partial-count row per distinct key per map "
        "task (~0.7n rows at this cardinality); the sketch tier shuffles "
        "<= parts*4k candidates + the hot rows' recount. Local NVMe "
        "shuffle hides much of that delta — the tier's value is the "
        "network-shuffle bound at cluster scale, and this row pins "
        "correctness + local cost at n large"
    )
    return out


def _graph_analytics_evidence(spark, n: int) -> dict:
    """Triangle counting / k-core / label propagation at graph scale,
    every wall paired with an exact closed-form correctness assert.

    Synthesis (pure spark.range arithmetic, no driver loops): node ids
    [0, n) partition into disjoint 20-cliques (clique id = node div
    20), plus n/4 extra nodes in 100-chains. Closed forms: every
    clique node sits in C(19,2)=171 triangles and survives the k=19
    core with degree 19 (chains have no triangles and die in the first
    peel); 3 LPA rounds on a disjoint clique converge to the clique's
    min id (round 1 leaves the min holding the runner-up's id, round 2
    snaps it back — the synchronous-update wrinkle the operator's
    tie-break makes deterministic)."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.graph import (
        kcore_peel,
        label_propagation,
        triangle_counts,
    )

    clique = 20
    chain = 100
    n_chain = n // 4
    nodes = spark.range(n).select(
        F.col("id"), (F.col("id") / clique).cast("long").alias("cid")
    )
    clique_edges = (
        nodes.alias("x")
        .join(nodes.alias("y"), "cid")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("src"), F.col("y.id").alias("dst"))
    )
    ch = spark.range(n, n + n_chain)
    chain_edges = (
        ch.filter(((F.col("id") - n) % chain != chain - 1) & (F.col("id") < n + n_chain - 1))
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    edges = clique_edges.unionByName(chain_edges).localCheckpoint(eager=True)
    n_edges = edges.count()
    n_cliques = n // clique
    out: dict = {
        "sf": f"synthetic-{n}-graph-analytics", "n_clique_nodes": n,
        "clique_size": clique, "n_chain_nodes": n_chain, "n_edges": n_edges,
    }

    t0 = time.time()
    tri = triangle_counts(edges).localCheckpoint(eager=True)
    out["triangles_s"] = round(time.time() - t0, 2)
    out["triangle_rows"] = tri.count()
    out["triangles_wrong"] = tri.filter(
        (F.col("node") >= n) | (F.col("n_triangles") != 171)
    ).count()
    out["triangles_total"] = n_cliques * 1140  # C(20,3) per clique
    assert out["triangle_rows"] == n and out["triangles_wrong"] == 0

    t0 = time.time()
    core = kcore_peel(edges, k=clique - 1, rounds=2).localCheckpoint(eager=True)
    out["kcore_s"] = round(time.time() - t0, 2)
    out["kcore_rows"] = core.count()
    out["kcore_wrong"] = core.filter(
        (F.col("node") >= n) | (F.col("deg") != clique - 1)
    ).count()
    assert out["kcore_rows"] == n and out["kcore_wrong"] == 0

    t0 = time.time()
    lpa = label_propagation(clique_edges, rounds=3).localCheckpoint(eager=True)
    out["lpa_s"] = round(time.time() - t0, 2)
    out["lpa_rows"] = lpa.count()
    out["lpa_wrong"] = lpa.filter(
        F.col("label") != F.col("node") - F.col("node") % clique
    ).count()
    assert out["lpa_rows"] == n and out["lpa_wrong"] == 0
    out["note"] = (
        "triangle/k-core/LPA at graph scale over closed-form clique+chain "
        "synthesis: every node's triangle count, core degree, and "
        "community label asserted exactly (wrong counts must be 0), so "
        "the walls measure verified work"
    )
    return out


def _pagerank_evidence(spark, n: int) -> dict:
    """Execute q113's pagerank kernel at graph scale (n nodes, 3n
    edges, 5 rounds) and record the wall plus the mass-conservation
    sanity (every node has out-degree 3, so total rank stays ~scale up
    to div truncation). The per-round cost is one edge-vs-rank
    equi-join + one dst-keyed agg — linear shuffles, so the row pins
    seconds-per-(edge·round) for capacity planning."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.graph import pagerank

    rounds, scale = 5, 10**12
    nodes = spark.range(n).selectExpr("id AS node").localCheckpoint(eager=True)
    nd = F.col("node")
    edges = nodes.select(
        nd.alias("src"),
        F.explode(
            F.slice(
                F.array((nd * 7 + 1) % n, (nd * 13 + 2) % n, (nd * 29 + 3) % n),
                1,
                (nd % 3 + 1).cast("int"),
            )
        ).alias("dst"),
    ).localCheckpoint(eager=True)
    t0 = time.time()
    ranks = pagerank(edges, nodes=nodes, n_iter=rounds, scale=scale)
    total, n_out = ranks.agg(F.sum("p"), F.count(F.lit(1))).first()
    t = time.time() - t0
    assert n_out == n
    return {
        "sf": f"synthetic-{n}-pagerank",
        "n_nodes": n,
        "n_edges": 2 * n,  # avg out-degree (1 + id%3) = 2
        "rounds": rounds,
        "pagerank_s": round(t, 2),
        "rank_mass_retained": round(total / scale, 6),
    }


def _sq8_evidence(spark, n: int) -> dict:
    """Execute the SQ8 quantized tier at design size and record what a
    capacity planner needs: index bytes/row (1 byte/dim + id), the
    candidate+rerank wall vs the exact grid scan on the SAME corpus,
    and measured recall. The candidate gemm runs on 1-byte codes via
    the exact float64-BLAS trick (operators/quantize.py), so the tier
    trades a bounded recall loss for an 8× smaller working set — the
    constraint that actually binds at 100 TB."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.quantize import sq8_search
    from pyspark_mrdf_spark.operators.similarity import knn_search_blocked

    syn_dir = "/root/repo/.scalability_synth_sq8"
    n_q = n // 10
    out: dict = {
        "sf": f"synthetic-{n}-sq8", "n": n, "n_queries": n_q,
        "distribution": "mixture",
    }
    try:
        _write_synthetic(syn_dir, n)
        emb = spark.read.parquet(os.path.join(syn_dir, "embeddings.parquet"))
        emb = emb.localCheckpoint(eager=True)
        # warm the PYTHON workers like main() warms the JVM (spawn is
        # ~2.5s for 32 Arrow workers); the remaining first-invocation
        # cost (JIT of the Arrow runner paths — measured ~3× on the
        # first quantize scan of a session) is adjudicated the same way
        # bench.py does: each search runs twice, cold AND warm recorded
        dp = spark.sparkContext.defaultParallelism

        def _noop(batches):
            yield from batches

        spark.range(0, dp * 100, 1, dp).mapInPandas(_noop, "id long").count()
        # external-search shape (the operator's bounded-query contract —
        # sq8_candidates broadcasts the query codes): 10% of the corpus
        # queries the full corpus, same shape as the grid-evidence row
        queries = emb.filter(F.col("vec_id") < n_q)

        t0 = time.time()
        g_exact = knn_search_blocked(
            queries, emb, K, n_blocks=32, n_query_blocks=16, include_self=False
        ).localCheckpoint(eager=True)
        out["knn_exact_s"] = round(time.time() - t0, 2)

        def _timed(build):
            t0 = time.time()
            g = build().localCheckpoint(eager=True)
            return g, round(time.time() - t0, 2)

        g_sq8, cold = _timed(
            lambda: sq8_search(queries, emb, K, k_candidates=4 * K, include_self=False)
        )
        _, warm = _timed(
            lambda: sq8_search(queries, emb, K, k_candidates=4 * K, include_self=False)
        )
        out["sq8_cold_s"], out["sq8_warm_s"] = cold, warm
        out["sq8_recall"] = round(recall(g_exact, g_sq8), 4)
        out["k_candidates"] = 4 * K
        out["index_bytes_per_row"] = 64 + 8  # d uint8 codes + int64 id
        out["float32_bytes_per_row"] = 64 * 4 + 8

        # PQ tier on the same corpus/queries: 8 B/row index, ADC
        # table-lookup candidates (8 lookups/row vs 64 multiplies);
        # coarse 8×16 codes need a larger candidate budget for recall
        from pyspark_mrdf_spark.operators.quantize import pq_search

        g_pq, cold = _timed(
            lambda: pq_search(queries, emb, K, k_candidates=16 * K, include_self=False)
        )
        _, warm = _timed(
            lambda: pq_search(queries, emb, K, k_candidates=16 * K, include_self=False)
        )
        out["pq_cold_s"], out["pq_warm_s"] = cold, warm
        out["pq_recall"] = round(recall(g_exact, g_pq), 4)
        out["pq_k_candidates"] = 16 * K
        out["pq_index_bytes_per_row"] = 8 + 8  # 8 subspace codes + id

        # IVF-PQ at size: 64 cells / probe 8 scans ~12.5% of the corpus
        # on 8 B/row residual codes — scan-fraction × compression, the
        # composition a 100 TB deployment actually ships
        from pyspark_mrdf_spark.operators.quantize import ivfpq_search

        ivfpq_kw = dict(
            k_candidates=16 * K, n_centroids=64, n_probe=8,
            sample_size=4096, include_self=False,
        )
        g_ivfpq, cold = _timed(lambda: ivfpq_search(queries, emb, K, **ivfpq_kw))
        _, warm = _timed(lambda: ivfpq_search(queries, emb, K, **ivfpq_kw))
        out["ivfpq_cold_s"], out["ivfpq_warm_s"] = cold, warm
        out["ivfpq_recall"] = round(recall(g_exact, g_ivfpq), 4)
        out["ivfpq_cells"], out["ivfpq_probe"] = 64, 8
        out["ivfpq_scan_fraction"] = 8 / 64
    finally:
        shutil.rmtree(syn_dir, ignore_errors=True)
    return out


def _grid_evidence(spark, n: int) -> dict:
    """Execute the blocked exact operators at design size with
    MULTI-CELL grids (M·B ≫ 1) and record the evidence a reviewer
    needs: the grid shape that ran, wall time, and measured per-side
    block balance — each cogroup cell receives exactly one query block
    + one corpus block by construction, so max block sizes ARE the
    per-task peak row counts (~|Q|/M + |C|/B when hashing balances,
    which is asserted here within 30%)."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.similarity import (
        cosine_topk_by_group_blocked,
        knn_search_blocked,
    )

    syn_dir = "/root/repo/.scalability_synth_grid"
    out: dict = {"sf": f"synthetic-{n}-grid", "n": n, "distribution": "mixture"}
    try:
        _write_synthetic(syn_dir, n)
        emb = spark.read.parquet(os.path.join(syn_dir, "embeddings.parquet"))
        emb = emb.localCheckpoint(eager=True)

        def block_balance(df, col, n_blocks, side_rows):
            mx = (
                df.groupBy(F.pmod(F.hash(F.col(col)), F.lit(n_blocks)).alias("b"))
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )
            ideal = side_rows / n_blocks
            assert mx <= 1.3 * ideal, f"block skew: max {mx} vs ideal {ideal:.0f}"
            return int(mx)

        # 1) knn_search_blocked: 5k external queries vs the full 50k
        #    corpus on a 16x32 grid (512 cells)
        B, M = 32, 16
        queries = emb.filter(F.col("vec_id") < n // 10)
        t0 = time.time()
        cnt = knn_search_blocked(
            queries, emb, K, n_blocks=B, n_query_blocks=M, include_self=False
        ).count()
        out["knn_search_blocked"] = {
            "n_blocks": B,
            "n_query_blocks": M,
            "grid_cells": B * M,
            "rows_out": int(cnt),
            "seconds": round(time.time() - t0, 2),
            "max_corpus_block_rows": block_balance(emb, "vec_id", B, n),
            "max_query_block_rows": block_balance(queries, "vec_id", M, n // 10),
            "per_task_peak_rows_bound": f"~{n // 10}/{M} + {n}/{B}",
        }

        # 2) cosine_topk_by_group_blocked: 4 labels of ~12.5k rows, 4x8
        #    grid per group (32 cells/group, 128 total)
        B2, M2 = 8, 4
        four = emb.withColumn("label", (F.col("vec_id") % 4).cast("int"))
        t0 = time.time()
        cnt2 = cosine_topk_by_group_blocked(
            four, 5, n_blocks=B2, n_query_blocks=M2
        ).count()
        dt2 = time.time() - t0
        # per-task peak is per (group, block): max over the
        # (label, hash-block) grid, ideal (n/4)/B2
        mx2 = (
            four.groupBy(
                "label", F.pmod(F.hash(F.col("vec_id")), F.lit(B2)).alias("b")
            )
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert mx2 <= 1.3 * (n / 4) / B2, f"group-block skew: max {mx2}"
        out["cosine_topk_by_group_blocked"] = {
            "n_blocks": B2,
            "n_query_blocks": M2,
            "grid_cells_per_group": B2 * M2,
            "n_groups": 4,
            "rows_out": int(cnt2),
            "seconds": round(dt2, 2),
            "max_group_block_rows": int(mx2),
            "per_task_peak_rows_bound": f"~({n}/4)/{M2} + ({n}/4)/{B2}",
        }
    finally:
        shutil.rmtree(syn_dir, ignore_errors=True)
    return out


def _serving_evidence(spark, n: int, d: int, n_cells: int = 64,
                      n_probe: int = 8, n_codes: int = 16,
                      k_cand: int | None = None, rotate: str | None = None,
                      aniso: bool = False) -> dict:
    """The quantized-tier WIN regime, measured: at high dimension the
    exact scan is memory-bound (the precision-safe (q-x)² kernel moves
    n_q·n·d·16 bytes per batch — at n=200k, d=512, 2000 queries that is
    ~3.3 TB), while the quantized tiers move 8-64× fewer bytes: SQ8
    scans 1 B/dim codes through an expanded-form BLAS gemm (exact in
    float64 BECAUSE the code domain is integer — the float kernel
    cannot use that form without losing the trustworthy ordering), and
    IVF-PQ scans ~n_probe/n_cells of the corpus at ds-byte residual
    codes. Both serve off a PERSISTED index (train once, load, serve —
    operators/quantize.py write/read_*_index), so the per-batch cost is
    search alone; index build time is recorded separately as the
    one-time cost a deployment amortizes.

    Emits per-batch wall times for ``n_batches`` disjoint query batches
    plus recall (batch 0, vs the exact grid scan) — the row VERDICT r7
    ask #3 requires: a quantized tier faster than exact wall-clock at
    recall ≥ 0.9."""
    import tempfile

    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.quantize import (
        build_ivfpq_index,
        build_sq8_index,
        ivfpq_search_encoded,
        read_index_rotation,
        read_ivfpq_index,
        read_sq8_index,
        sq8_search_encoded,
    )
    from pyspark_mrdf_spark.operators.similarity import knn_search_blocked

    syn_dir = "/root/repo/.scalability_synth_serving"
    batch_size = 2_000
    n_batches = 3
    # IVF-PQ geometry at d: keep the measured-good ds=8 residual
    # subspaces (so n_sub scales with d) and the 64-cell/8-probe coarse
    # layer from the 50k row; ADC tables stay an O(parameters)
    # broadcast (n_q·n_probe·n_sub·16 doubles ≈ 131 MB at d=512)
    ds_sub = 8
    n_sub = d // ds_sub
    if k_cand is None:
        k_cand = 64 * K
    suffix = ("-aniso" if aniso else "") + (f"-rotate-{rotate}" if rotate else "")
    out: dict = {
        "sf": f"synthetic-{n}x{d}-serving{suffix}", "n": n, "d": d,
        "batch_size": batch_size, "n_batches": n_batches,
        "ivfpq_cells": n_cells, "ivfpq_probe": n_probe,
        "ivfpq_subspaces": n_sub, "ivfpq_scan_fraction": n_probe / n_cells,
    }
    if rotate not in (None, "opq"):
        raise ValueError(f"_serving_evidence: unknown rotate {rotate!r}")
    try:
        _write_synthetic(syn_dir, n, d=d, aniso=aniso)
        emb = spark.read.parquet(os.path.join(syn_dir, "embeddings.parquet"))
        emb = emb.localCheckpoint(eager=True)
        dp = spark.sparkContext.defaultParallelism

        def _noop(batches):
            yield from batches

        spark.range(0, dp * 100, 1, dp).mapInPandas(_noop, "id long").count()

        batches = [
            emb.filter(
                (F.col("vec_id") >= i * batch_size)
                & (F.col("vec_id") < (i + 1) * batch_size)
            )
            for i in range(n_batches)
        ]

        def _timed(build):
            t0 = time.time()
            g = build().localCheckpoint(eager=True)
            return g, round(time.time() - t0, 2)

        exact_s, exact_g = [], None
        for i, q in enumerate(batches):
            g, dt = _timed(
                lambda: knn_search_blocked(
                    q, emb, K, n_blocks=32, n_query_blocks=8, include_self=False
                )
            )
            exact_s.append(dt)
            if i == 0:
                exact_g = g
        out["exact_batch_s"] = exact_s

        idx_root = tempfile.mkdtemp(prefix="mrdf_serving_idx_")

        # SQ8: build+persist once, then serve batches off the loaded codes
        t0 = time.time()
        build_sq8_index(emb, os.path.join(idx_root, "sq8"))
        out["sq8_index_build_s"] = round(time.time() - t0, 2)
        mn, mx, sq8_codes_df = read_sq8_index(spark, os.path.join(idx_root, "sq8"))
        sq8_codes_df = sq8_codes_df.localCheckpoint(eager=True)
        sq8_s, sq8_g = [], None
        for i, q in enumerate(batches):
            g, dt = _timed(
                lambda: sq8_search_encoded(
                    q, sq8_codes_df, mn, mx, emb, K,
                    k_candidates=4 * K, include_self=False,
                )
            )
            sq8_s.append(dt)
            if i == 0:
                sq8_g = g
        out["sq8_batch_s"] = sq8_s
        out["sq8_recall"] = round(recall(exact_g, sq8_g), 4)
        out["sq8_index_bytes_per_row"] = d + 8

        # IVF-PQ: train+encode+persist once (cell-partitioned codes),
        # serve batches off the loaded index. rotate='opq' (r13: the
        # PERSISTED path — rotation trained by build_ivfpq_index,
        # stored in params.parquet, read back with the index): each
        # query batch serves through the frozen rotation
        # (rotation= on ivfpq_search_encoded — rotated driver-side,
        # reranked in the ORIGINAL space on the original corpus), so
        # this row measures exactly the train-once/search-many
        # deployment q159's inline win previously could not serve.
        # Timing split (r12 advisor): rotation_train_s is opq_train
        # alone; corpus rotate+encode rides inside ivfpq_index_build_s
        # like every other encode cost.
        t0 = time.time()
        build_metrics: dict = {}
        build_ivfpq_index(
            emb, os.path.join(idx_root, "ivfpq"),
            n_centroids=n_cells, n_subspaces=n_sub, n_codes=n_codes,
            sample_size=max(4096, 16 * n_cells, 16 * n_codes),
            rotate=rotate, metrics_out=build_metrics,
        )
        out["ivfpq_index_build_s"] = round(time.time() - t0, 2)
        if rotate == "opq":
            # rotation training time attributed by the build itself
            # (advisor r13: no second opq_train run, no double count —
            # rotation_train_s is a SUBSET of ivfpq_index_build_s)
            out["rotation_train_s"] = build_metrics.get("rotation_train_s")
            out["rotation_persisted"] = True
        rotation = read_index_rotation(os.path.join(idx_root, "ivfpq"))
        assert (rotation is not None) == (rotate == "opq")
        coarse, cb, codes = read_ivfpq_index(spark, os.path.join(idx_root, "ivfpq"))
        codes = codes.localCheckpoint(eager=True)
        # candidate budget 64·K: at d=512 same-cluster distances
        # CONCENTRATE (all ≈ sqrt(2d)·σ, tiny margins), so ADC ranking
        # inside a cell is noisy — recall is bought with the cheap
        # (table-lookup) candidate stage, then the exact rerank fixes
        # the order; 160 candidates measured 0.47 here, the budget is
        # the dial (same lesson as the flat-PQ sweep at d=64)
        ivfpq_s, ivfpq_g = [], None
        for i, q in enumerate(batches):
            g, dt = _timed(
                lambda: ivfpq_search_encoded(
                    q, codes, coarse, cb, emb, K,
                    k_candidates=k_cand, n_probe=n_probe, include_self=False,
                    rotation=rotation,
                )
            )
            ivfpq_s.append(dt)
            if i == 0:
                ivfpq_g = g
        out["ivfpq_k_candidates"] = k_cand
        out["ivfpq_n_codes"] = n_codes
        out["ivfpq_batch_s"] = ivfpq_s
        out["ivfpq_recall"] = round(recall(exact_g, ivfpq_g), 4)
        out["ivfpq_index_bytes_per_row"] = n_sub + 8 + 8
        shutil.rmtree(idx_root, ignore_errors=True)
    finally:
        shutil.rmtree(syn_dir, ignore_errors=True)
    return out




def _bq_serving_evidence(spark, n: int, d: int) -> dict:
    """The 1-BIT tier at the memory-bound serving point: exact blocked
    scan vs persisted-SQ8 vs persisted-BQ per 2000-query batch. BQ
    codes are d/8 bytes/row — 8× below SQ8, 64× below the float64
    working set — and the candidate scan is XOR + popcount; the open
    question this row answers is whether 1-bit Hamming retains enough
    metric signal at dimension d to reach recall ≥ 0.9 at a candidate
    budget whose rerank does not eat the scan savings. Measured at two
    budgets so the recall/budget dial is part of the record."""
    import tempfile

    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.quantize import (
        build_bq_index,
        build_sq8_index,
        bq_search_encoded,
        read_bq_index,
        read_sq8_index,
        sq8_search_encoded,
    )
    from pyspark_mrdf_spark.operators.similarity import knn_search_blocked

    syn_dir = "/root/repo/.scalability_synth_bq_serving"
    batch_size = 2_000
    n_batches = 3
    out: dict = {
        "sf": f"synthetic-{n}x{d}-bq-serving", "n": n, "d": d,
        "batch_size": batch_size, "n_batches": n_batches,
    }
    try:
        _write_synthetic(syn_dir, n, d=d)
        emb = spark.read.parquet(os.path.join(syn_dir, "embeddings.parquet"))
        emb = emb.localCheckpoint(eager=True)
        dp = spark.sparkContext.defaultParallelism

        def _noop(batches):
            yield from batches

        spark.range(0, dp * 100, 1, dp).mapInPandas(_noop, "id long").count()

        batches = [
            emb.filter(
                (F.col("vec_id") >= i * batch_size)
                & (F.col("vec_id") < (i + 1) * batch_size)
            )
            for i in range(n_batches)
        ]

        def _timed(build):
            t0 = time.time()
            g = build().localCheckpoint(eager=True)
            return g, round(time.time() - t0, 2)

        exact_s, exact_g = [], None
        for i, q in enumerate(batches):
            g, dt = _timed(
                lambda: knn_search_blocked(
                    q, emb, K, n_blocks=32, n_query_blocks=8, include_self=False
                )
            )
            exact_s.append(dt)
            if i == 0:
                exact_g = g
        out["exact_batch_s"] = exact_s

        idx_root = tempfile.mkdtemp(prefix="mrdf_bq_serving_idx_")

        t0 = time.time()
        build_sq8_index(emb, os.path.join(idx_root, "sq8"))
        out["sq8_index_build_s"] = round(time.time() - t0, 2)
        mn, mx, sq8_codes_df = read_sq8_index(spark, os.path.join(idx_root, "sq8"))
        sq8_codes_df = sq8_codes_df.localCheckpoint(eager=True)
        sq8_s, sq8_g = [], None
        for i, q in enumerate(batches):
            g, dt = _timed(
                lambda: sq8_search_encoded(
                    q, sq8_codes_df, mn, mx, emb, K,
                    k_candidates=4 * K, include_self=False,
                )
            )
            sq8_s.append(dt)
            if i == 0:
                sq8_g = g
        out["sq8_batch_s"] = sq8_s
        out["sq8_recall"] = round(recall(exact_g, sq8_g), 4)
        out["sq8_index_bytes_per_row"] = d + 8

        t0 = time.time()
        build_bq_index(emb, os.path.join(idx_root, "bq"))
        out["bq_index_build_s"] = round(time.time() - t0, 2)
        thr, bq_codes_df = read_bq_index(spark, os.path.join(idx_root, "bq"))
        bq_codes_df = bq_codes_df.localCheckpoint(eager=True)
        for kc in (64 * K, 256 * K):
            bq_s, bq_g = [], None
            for i, q in enumerate(batches):
                g, dt = _timed(
                    lambda: bq_search_encoded(
                        q, bq_codes_df, thr, emb, K,
                        k_candidates=kc, include_self=False,
                    )
                )
                bq_s.append(dt)
                if i == 0:
                    bq_g = g
            out[f"bq_batch_s_cand{kc}"] = bq_s
            out[f"bq_recall_cand{kc}"] = round(recall(exact_g, bq_g), 4)
        out["bq_index_bytes_per_row"] = d // 8 + 8
        shutil.rmtree(idx_root, ignore_errors=True)
    finally:
        shutil.rmtree(syn_dir, ignore_errors=True)
    return out


def _write_synthetic_docs(path: str, n: int, seed: int = 11) -> None:
    """Seeded synthetic documents table (doc_id, text, lang, source,
    n_chars) with PLANTED duplication at realistic rates: ~2% exact
    copies, ~5% near-copies (one word substituted every 25 words), and
    ~3% of docs sharing an injected 12-word verbatim passage — the
    three signals the dedup tiers detect. Vocabulary is 5000 md5-hex
    words; doc lengths 150-400 words."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab = np.array(
        [hashlib.md5(f"w{i}".encode()).hexdigest()[:8] for i in range(5000)]
    )
    langs = np.array(["en", "de", "fr", "es", "zh"])
    passage = " ".join(hashlib.md5(f"p{i}".encode()).hexdigest()[:8] for i in range(12))
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if r < 0.02 and i > 10:
            texts.append(texts[rng.integers(0, i)])  # exact copy
            continue
        length = int(rng.integers(150, 400))
        words = vocab[rng.integers(0, len(vocab), length)].tolist()
        if r < 0.07 and i > 10:
            base = texts[rng.integers(0, i)].split(" ")
            for j in range(0, len(base), 25):
                base[j] = words[j % len(words)]
            texts.append(" ".join(base))  # near copy
            continue
        if r < 0.10:
            pos = int(rng.integers(0, length - 1))
            words.insert(pos, passage)  # shared verbatim passage
        texts.append(" ".join(words))
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs[rng.integers(0, 5, n)], type=pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], type=pa.string()),
            "n_chars": pa.array(
                np.array([len(s) for s in texts], dtype=np.int64)
            ),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(t, os.path.join(path, "documents.parquet"))


def _dedup_evidence(spark, n: int) -> dict:
    """Execute the dedup tiers at design size and record (rows found,
    seconds) per tier — converting the 'good at 100 TB' plan-shape
    grades into measured points. The three TEXT tiers (exact,
    MinHash-LSH, substring) run on the planted-duplicate corpus and
    stream fingerprints, never documents (the scale claim being
    evidenced); the SEMANTIC tier (SemDeDup) runs on a synthetic
    embedding set, where the bounded quantity is the largest
    cluster's within-cell pairwise block (the n/k dial)."""
    from pyspark_mrdf_spark.operators.dedup import (
        dup_substring_spans,
        exact_duplicates,
        lsh_band_buckets,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    syn_dir = "/root/repo/.scalability_synth_dedup"
    out: dict = {"sf": f"synthetic-{n}-dedup", "n_docs": n}
    try:
        _write_synthetic_docs(syn_dir, n)
        # the writer emits ONE parquet file = one input split; without
        # this repartition the whole 36M-gram hash pass of the
        # substring tier lands in a single task (measured: 464 s
        # single-threaded vs ~17 s across cores). A real corpus has
        # thousands of splits — the repartition stands in for them.
        d = spark.read.parquet(os.path.join(syn_dir, "documents.parquet"))
        d = d.repartition(2 * spark.sparkContext.defaultParallelism)
        d = d.localCheckpoint(eager=True)
        out["corpus_mchars"] = round(
            d.selectExpr("sum(n_chars)").collect()[0][0] / 1e6, 1
        )

        t0 = time.time()
        groups = exact_duplicates(d).localCheckpoint(eager=True)
        out["exact_dup_s"] = round(time.time() - t0, 2)
        out["exact_dup_groups"] = groups.count()

        t0 = time.time()
        cand = lsh_candidate_pairs(
            lsh_band_buckets(minhash_signatures(d, num_hashes=8, n=3), 4, 2)
        ).localCheckpoint(eager=True)
        out["minhash_lsh_s"] = round(time.time() - t0, 2)
        out["minhash_lsh_pairs"] = cand.count()

        t0 = time.time()
        spans = dup_substring_spans(d, gram_len=40, sample_mod=4).localCheckpoint(
            eager=True
        )
        out["substring_s"] = round(time.time() - t0, 2)
        out["substring_docs_hit"] = spans.count()

        # LM quality-scoring tier on the SAME planted corpus: trigram
        # stupid-backoff train (3 n-gram count aggs + context joins) +
        # self-score of every document — the CCNet-band pass a corpus
        # runs after dedup
        from pyspark_mrdf_spark.operators.lm import lm_score, lm_train

        t0 = time.time()
        tri, bi, uni = lm_train(d)
        scored = lm_score(d, tri, bi, uni).localCheckpoint(eager=True)
        out["lm_train_score_s"] = round(time.time() - t0, 2)
        out["lm_docs"] = scored.count()

        # SemDeDup tier at design size: 50k mixture embeddings, k =
        # n/1000 clusters (the cluster-size dial that bounds the
        # within-cluster pairwise block)
        from pyspark_mrdf_spark.operators.dedup import semantic_dedup
        from pyspark_mrdf_spark.operators.similarity import ivf_train_centroids

        n_emb, n_cells = 50_000, 50
        _write_synthetic(syn_dir, n_emb)
        emb = spark.read.parquet(os.path.join(syn_dir, "embeddings.parquet"))
        emb = emb.repartition(2 * spark.sparkContext.defaultParallelism)
        emb = emb.localCheckpoint(eager=True)
        t0 = time.time()
        cents = ivf_train_centroids(
            emb, n_centroids=n_cells, sample_size=4096, iters=8, seed=7
        )
        sem = semantic_dedup(emb, cents, threshold_e6=950_000).localCheckpoint(
            eager=True
        )
        out["semantic_s"] = round(time.time() - t0, 2)
        out["semantic_n"] = n_emb
        out["semantic_cells"] = n_cells
        out["semantic_dups"] = sem.filter("NOT keep").count()
    finally:
        shutil.rmtree(syn_dir, ignore_errors=True)
    return out


def _dedup_serving_evidence(spark, n: int) -> dict:
    """Measure the persisted-dedup-index serving advantage: the daily
    ingest loop (3 batches of 1000 docs — 500 corpus copies + 500
    novels each) run (a) INLINE — `near_dedup_against(batch, corpus)`
    with the corpus-side signatures/buckets recomputed per batch, the
    corpus grown with survivors between batches — vs (b) SERVED off a
    train-once persisted index (`write_dedup_index`) with survivors
    `append_dedup_index`-ed between batches. Inline per-batch cost
    scales with CORPUS bytes (the whole shingle+minhash pass re-runs);
    index-served cost scales with BATCH bytes plus a columnar scan of
    the stored state. Survivor sets are asserted identical."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.dedup import near_dedup_against
    from pyspark_mrdf_spark.operators.dedup_index import (
        append_dedup_index,
        near_dedup_against_index,
        read_dedup_index,
        write_dedup_index,
    )

    syn_dir = "/root/repo/.scalability_synth_dedup_srv"
    idx_dir = os.path.join(syn_dir, "index")
    out: dict = {
        "sf": f"synthetic-{n}-dedup-serving",
        "n_docs": n,
        "batch_docs": 1000,
        "n_batches": 3,
    }
    try:
        _write_synthetic_docs(syn_dir, n)
        d = (
            spark.read.parquet(os.path.join(syn_dir, "documents.parquet"))
            .select("doc_id", "text")
            .repartition(2 * spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)
        )
        out["corpus_mchars"] = round(
            d.selectExpr("sum(length(text))").collect()[0][0] / 1e6, 1
        )

        def batch_of(i: int):
            lo = 1000 * i
            copies = d.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 500)
            ).select((F.col("doc_id") + 10_000_000 + 100_000 * i).alias("doc_id"), "text")
            novel = d.filter(
                (F.col("doc_id") >= lo + 500) & (F.col("doc_id") < lo + 1000)
            ).select(
                (F.col("doc_id") + 20_000_000 + 100_000 * i).alias("doc_id"),
                F.reverse("text").alias("text"),
            )
            return copies.unionByName(novel).localCheckpoint(eager=True)

        batches = [batch_of(i) for i in range(3)]

        inline_s, inline_survivors = [], []
        corpus_now = d
        for b in batches:
            t0 = time.time()
            surv = near_dedup_against(b, corpus_now, threshold=0.5).localCheckpoint(
                eager=True
            )
            ids = sorted(r[0] for r in surv.select("doc_id").collect())
            inline_s.append(round(time.time() - t0, 2))
            inline_survivors.append(ids)
            corpus_now = corpus_now.unionByName(surv).localCheckpoint(eager=True)

        t0 = time.time()
        write_dedup_index(d, idx_dir)
        out["index_build_s"] = round(time.time() - t0, 2)
        served_s, served_survivors, append_s = [], [], []
        for b in batches:
            idx = read_dedup_index(spark, idx_dir)
            t0 = time.time()
            surv = near_dedup_against_index(b, idx, threshold=0.5).localCheckpoint(
                eager=True
            )
            ids = sorted(r[0] for r in surv.select("doc_id").collect())
            served_s.append(round(time.time() - t0, 2))
            served_survivors.append(ids)
            t0 = time.time()
            append_dedup_index(spark, idx_dir, surv)
            append_s.append(round(time.time() - t0, 2))
        # full id-SET equality per batch, not just counts — a serving
        # bug that swaps which of two colliding docs is dropped must
        # fail here, matching the claim the recorded row makes
        assert served_survivors == inline_survivors, (
            served_survivors,
            inline_survivors,
        )
        out["inline_batch_s"] = inline_s
        out["index_batch_s"] = served_s
        out["index_append_s"] = append_s
        out["survivors_per_batch"] = [len(ids) for ids in served_survivors]
    finally:
        shutil.rmtree(syn_dir, ignore_errors=True)
    return out



def _mixture_sampled_evidence(spark, n: int, n_sample: int = 1000) -> dict:
    """The crossover point past the full-exact-scan budget: MRDF at
    design size with recall measured against a SAMPLED exact ground
    truth. At n=300k the full n-squared exact scan alone costs ~25 min
    on 32 cores (1476.6 s, r8 row) and the 32-worker MRDF phase
    OOM-killed the 125 GB box — so this row runs MRDF under the
    documented reduced-worker dial (SPARK_GRAFT_CPUS=16) and replaces
    the full scan with exact top-k for ``n_sample`` md5-chosen query
    rows against the full corpus: the blocked grid scan at n_q=1000
    costs ~n_sample/n of the full scan, and mean recall over a uniform
    1000-query sample estimates true recall to about +/-0.01 (binomial:
    k*n_sample = 10k Bernoulli edges). The r8 full-scan rows at
    n <= 200k pin this same estimator against the exhaustive number."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.operators.similarity import knn_search_blocked

    syn_dir = "/root/repo/.scalability_synth_sampled"
    out: dict = {
        "sf": f"synthetic-{n}-mixture-sampled-recall", "n": n,
        "distribution": "mixture", "n_sample_queries": n_sample,
        "alpha": 16384, "refine_rounds": 1, "max_iter": 3,
        "workers": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    # Peak-memory watch (box-wide used = MemTotal - MemAvailable,
    # sampled at 1 Hz): the r8 n=300k OOM was only diagnosed by ad-hoc
    # RSS sampling — the frontier rows carry the number permanently so
    # a regression in kernel chunking shows up as a memory spike, not
    # a dead box. Box-wide (not driver RSS) because the working set
    # lives in the pyspark worker processes and the JVM.
    import threading

    peak = {"used_gib": 0.0, "at": 0.0}
    stop_evt = threading.Event()
    t_start = time.time()
    phases: list[tuple[str, float, float]] = []

    def _watch():
        while not stop_evt.is_set():
            try:
                info = {}
                with open("/proc/meminfo") as fh:
                    for line in fh:
                        k, v = line.split(":", 1)
                        info[k] = int(v.strip().split()[0])
                used = (info["MemTotal"] - info["MemAvailable"]) / (1 << 20)
                if used > peak["used_gib"]:
                    peak["used_gib"] = used
                    peak["at"] = time.time() - t_start
            except (OSError, KeyError, ValueError):
                pass
            stop_evt.wait(1.0)

    def _phase(name):
        # attribute the eventual peak to the phase active when it was
        # sampled (r12's 124.4-of-125 GiB frontier number had no owner;
        # the chunking fix needs to know WHICH stage to chunk)
        from contextlib import contextmanager

        @contextmanager
        def _cm():
            t0 = time.time() - t_start
            try:
                yield
            finally:
                phases.append((name, round(t0, 1), round(time.time() - t_start, 1)))

        return _cm()

    watcher = threading.Thread(target=_watch, daemon=True)
    watcher.start()
    try:
        with _phase("write_synthetic"):
            _write_synthetic(syn_dir, n, k_clusters=250)
        emb = spark.read.parquet(os.path.join(syn_dir, "embeddings.parquet"))

        with _phase("mrdf_build"):
            pt = _mrdf_point(
                spark, emb, "mixture-sampled", rho=4, alpha=16384,
                centroid_broadcast_max_paths=0,
            )
        max_leaf = max(m.get("max_leaf", 0) for m in pt["metrics"])
        join_rounds = sum(m.get("join_tier_rounds", 0) for m in pt["metrics"])
        assert max_leaf > 4096, f"tiled-exact leaf tier did not activate: {max_leaf}"
        assert join_rounds >= 1, "centroid join tier did not activate"
        g = pt.pop("graph")

        q = (
            emb.orderBy(F.md5(F.concat(F.lit("31:"), F.col("vec_id").cast("string"))))
            .limit(n_sample)
            .localCheckpoint(eager=True)
        )
        t0 = time.time()
        with _phase("sampled_exact_gt"):
            gt = knn_search_blocked(
                q, emb, K, n_blocks=32, n_query_blocks=4, include_self=False
            ).localCheckpoint(eager=True)
        out["sampled_exact_s"] = round(time.time() - t0, 2)

        qid = [r["vec_id"] for r in q.select("vec_id").collect()]
        g_s = g.filter(F.col("src").isin(qid))
        out["mrdf_s"] = pt["mrdf_s"]
        with _phase("recall_score"):
            out["mrdf_recall_sampled"] = round(
                recall(gt.select("src", "dst"), g_s), 4
            )
        out["max_leaf"] = int(max_leaf)
        out["join_tier_rounds"] = int(join_rounds)
    finally:
        stop_evt.set()
        watcher.join(timeout=3)
        out["peak_box_used_gib"] = round(peak["used_gib"], 1)
        out["peak_at_s"] = round(peak["at"], 1)
        out["peak_phase"] = next(
            (nm for nm, a, b in phases if a <= peak["at"] <= b), "unknown"
        )
        out["phase_spans_s"] = [list(p) for p in phases]
        shutil.rmtree(syn_dir, ignore_errors=True)
    return out


def _graph_append_evidence(
    spark, n: int, d: int = 64, batch_frac: float = 0.02, n_sample: int = 1000
) -> dict:
    """Incremental kNN-graph maintenance at scale (r11 verdict ask #3):
    the per-ingest-cycle cost of folding a ``batch_frac`` appended
    batch into an existing MRDF graph (``knn_graph_append``, graph
    tier — beam-search candidates over the OLD graph, reverse edges,
    one restricted refine round) vs REBUILDING the forest on the
    union. Recall for both is measured against the same sampled exact
    ground truth (the q56/mixture-sampled estimator: exact top-k for
    ``n_sample`` md5-chosen queries, ±~0.01); the claim is
    append_recall ≥ 0.95·rebuild_recall at ≥5× less wall per cycle."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.algorithms.graph_append import knn_graph_append
    from pyspark_mrdf_spark.algorithms.recall import recall
    from pyspark_mrdf_spark.operators.similarity import knn_search_blocked

    syn_dir = "/root/repo/.scalability_synth_gapp"
    total = int(n * (1 + batch_frac))
    out: dict = {
        "sf": f"synthetic-{n}x{d}-graph-append", "n_old": n,
        "batch": total - n, "batch_frac": batch_frac, "d": d, "k": K,
        "n_sample_queries": n_sample,
    }
    try:
        _write_synthetic(syn_dir, total, d=d, k_clusters=250)
        emb = (
            spark.read.parquet(os.path.join(syn_dir, "embeddings.parquet"))
            .localCheckpoint(eager=True)
        )
        old = emb.filter(F.col("vec_id") < n).localCheckpoint(eager=True)
        new = emb.filter(F.col("vec_id") >= n).localCheckpoint(eager=True)

        # the amortized base: the graph that already exists pre-append
        base = _mrdf_point(
            spark, old, "append-base", rho=4, alpha=16384,
            centroid_broadcast_max_paths=0,
        )
        out["base_build_s"] = base["mrdf_s"]
        old_graph = base["graph"]

        # the cost a rebuild-per-cycle deployment pays (same dial)
        reb = _mrdf_point(
            spark, emb, "append-rebuild", rho=4, alpha=16384,
            centroid_broadcast_max_paths=0,
        )
        out["rebuild_s"] = reb["mrdf_s"]

        t0 = time.time()
        inc = knn_graph_append(
            old_graph, old, new, K, mode="graph"
        ).localCheckpoint(eager=True)
        inc.count()
        out["append_s"] = round(time.time() - t0, 2)
        out["speedup_vs_rebuild"] = round(out["rebuild_s"] / out["append_s"], 2)

        q = (
            emb.orderBy(F.md5(F.concat(F.lit("31:"), F.col("vec_id").cast("string"))))
            .limit(n_sample)
            .localCheckpoint(eager=True)
        )
        t0 = time.time()
        gt = knn_search_blocked(
            q, emb, K, n_blocks=32, n_query_blocks=4, include_self=False
        ).localCheckpoint(eager=True)
        out["sampled_exact_s"] = round(time.time() - t0, 2)
        qid = [r["vec_id"] for r in q.select("vec_id").collect()]
        gt_sd = gt.select("src", "dst")
        out["append_recall_sampled"] = round(
            recall(gt_sd, inc.filter(F.col("src").isin(qid))), 4
        )
        out["rebuild_recall_sampled"] = round(
            recall(gt_sd, reb["graph"].filter(F.col("src").isin(qid))), 4
        )
        out["recall_ratio"] = round(
            out["append_recall_sampled"] / max(out["rebuild_recall_sampled"], 1e-9), 4
        )
    finally:
        shutil.rmtree(syn_dir, ignore_errors=True)
    return out


def _graph_append_chain_evidence(
    spark, n: int, d: int = 64, batch_frac: float = 0.02, cycles: int = 5,
    n_sample: int = 1000, serve: bool = False,
    retrain_below: float | None = None,
) -> dict:
    """CHAINED incremental maintenance (r12): the single-append row
    (synthetic-100000x64-graph-append) proves one fold is 10× cheaper
    than a rebuild — this row answers the question a deployment
    actually has: what happens over MANY ingest cycles with NO rebuild?
    Two failure modes are possible in principle and neither is visible
    from a single append: (a) recall drift — each graph-tier fold walks
    the previous fold's (approximate) graph for candidates, so error
    could compound cycle over cycle; (b) cost creep — if the
    affected-only merge ever re-windowed more than O(batch) rows, the
    per-cycle wall would grow with the accumulated corpus. The chain
    runs ``cycles`` successive ``batch_frac`` batches, each folded onto
    the operator's OWN rank-carrying output (zero-shuffle chaining, the
    module-docstring contract), and measures per cycle: append wall and
    sampled recall against an exact ground truth of the CURRENT union
    (the q56 estimator, ±~0.01). One final rebuild at the full size
    gives the comparand; the honest claims are final_recall ≥
    0.95·rebuild_recall AND a flat (batch-proportional) wall curve.

    The r13 LIFECYCLE dials (r12 verdict ask #6): ``retrain_below``
    wires the drift monitor into the loop — the per-cycle sampled
    recall IS the production estimator (one O(s·n) blocked exact pass
    per cycle, the q131-discipline monitor for graphs), and the first
    cycle that lands below the dial triggers a REBUILD of the base
    (measured; the chain then continues on the fresh graph; its wall
    doubles as the rebuild comparand). ``serve=True`` closes the loop
    with the q124 operator at its component-safe DEFAULT dial over the
    final maintained graph — the row then covers the whole
    build → append× → monitor → retrain → serve operating mode."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.algorithms.graph_append import knn_graph_append
    from pyspark_mrdf_spark.algorithms.recall import recall
    from pyspark_mrdf_spark.operators.similarity import knn_search_blocked

    syn_dir = "/root/repo/.scalability_synth_gapp_chain"
    m = int(n * batch_frac)
    total = n + cycles * m
    out: dict = {
        "sf": f"synthetic-{n}x{d}-graph-append-chain", "n_base": n,
        "batch": m, "batch_frac": batch_frac, "cycles": cycles, "d": d,
        "k": K, "n_sample_queries": n_sample,
    }
    try:
        _write_synthetic(syn_dir, total, d=d, k_clusters=250)
        emb = (
            spark.read.parquet(os.path.join(syn_dir, "embeddings.parquet"))
            .localCheckpoint(eager=True)
        )
        corpus = emb.filter(F.col("vec_id") < n).localCheckpoint(eager=True)

        base = _mrdf_point(
            spark, corpus, "chain-base", rho=4, alpha=16384,
            centroid_broadcast_max_paths=0,
        )
        out["base_build_s"] = base["mrdf_s"]
        # stats-pin the chain's entry graph: the build plan's stats
        # snapshot would otherwise seed cycle 1's compounding (the r12
        # wedge — see cache.pin_stats)
        from pyspark_mrdf_spark.cache import pin_stats

        graph = pin_stats(base["graph"])

        def _sampled_recall(cur_corpus, cur_graph):
            q = (
                cur_corpus.orderBy(
                    F.md5(F.concat(F.lit("31:"), F.col("vec_id").cast("string")))
                )
                .limit(n_sample)
                .localCheckpoint(eager=True)
            )
            gt = knn_search_blocked(
                q, cur_corpus, K, n_blocks=32, n_query_blocks=4,
                include_self=False,
            ).localCheckpoint(eager=True)
            qid = [r["vec_id"] for r in q.select("vec_id").collect()]
            return round(
                recall(
                    gt.select("src", "dst"),
                    cur_graph.filter(F.col("src").isin(qid)),
                ),
                4,
            )

        chain: list = []
        retrained_wall = None
        retrained_recall = None
        for c in range(cycles):
            lo, hi = n + c * m, n + (c + 1) * m
            new = emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            ).localCheckpoint(eager=True)
            t0 = time.time()
            # mode='graph' pinned: auto would route these m·n sizes to
            # the exact tier, and the chain claim is about the scale
            # path. materialize=True is the chained-deployment dial:
            # eager + stats-pinned output, so cycle c+1 plans on a
            # bounded leaf instead of compounding snapshot products
            # (the r12 planner wedge, cleared r13)
            graph = knn_graph_append(
                graph, corpus, new, K, mode="graph", materialize=True
            )
            append_s = round(time.time() - t0, 2)
            corpus = emb.filter(F.col("vec_id") < hi).localCheckpoint(eager=True)
            row = {
                "cycle": c + 1,
                "append_s": append_s,
                "recall_sampled": _sampled_recall(corpus, graph),
            }
            if retrain_below is not None and row["recall_sampled"] < retrain_below:
                # the monitor fired: rebuild on the CURRENT corpus and
                # continue the chain from the fresh graph — the
                # deployment's retrain step, measured in place
                t0 = time.time()
                reb_mid = _mrdf_point(
                    spark, corpus, f"chain-retrain-c{c + 1}", rho=4,
                    alpha=16384, centroid_broadcast_max_paths=0,
                )
                retrained_wall = reb_mid["mrdf_s"]
                graph = pin_stats(reb_mid["graph"])
                row["retrain_triggered"] = True
                row["retrain_s"] = retrained_wall
                row["recall_after_retrain"] = _sampled_recall(corpus, graph)
                # capture the REBUILD's recall AT RETRAIN TIME as the
                # comparand (advisor r13: reusing chain[-1]'s own final
                # recall as both numerator and denominator made
                # final_recall_ratio 1.0 by construction whenever the
                # dial fired)
                retrained_recall = row["recall_after_retrain"]
            chain.append(row)
            print(f"[scalability] chain cycle {row}", file=sys.stderr)
        out["chain"] = chain
        out["retrain_below"] = retrain_below
        out["total_append_s"] = round(sum(x["append_s"] for x in chain), 2)

        if retrained_wall is not None:
            # the mid-chain retrain already measured a full rebuild at
            # (approximately) the final size — reuse it as the
            # comparand instead of paying a second multi-hundred-second
            # build. The comparand recall is the REBUILD's recall AT
            # RETRAIN TIME (advisor r13), never the chain's own final
            # number — so the ratio below measures maintained-vs-
            # rebuilt honestly when the dial fires mid-chain.
            out["rebuild_s"] = retrained_wall
            out["rebuild_recall_sampled"] = retrained_recall
        else:
            reb = _mrdf_point(
                spark, corpus, "chain-rebuild", rho=4, alpha=16384,
                centroid_broadcast_max_paths=0,
            )
            out["rebuild_s"] = reb["mrdf_s"]
            out["rebuild_recall_sampled"] = _sampled_recall(corpus, reb["graph"])
        # numerator = the recall of the FINAL graph as maintained: the
        # last cycle's sampled recall — or its post-retrain recall in
        # the corner case where the dial fired on the very last cycle
        # (the final graph IS that rebuild, and the ratio saying 1.0
        # is then the true statement, not an artifact)
        out["final_recall_ratio"] = round(
            chain[-1].get("recall_after_retrain", chain[-1]["recall_sampled"])
            / max(out["rebuild_recall_sampled"], 1e-9),
            4,
        )

        if serve:
            # Serving-DIAL sweep over the final MAINTAINED graph (r13
            # verdict ask #5): the r13 row read walk recall 0.8368 at
            # the beam=64 default where BUILT-graph rows buy 0.95 at
            # e1024 — so sweep beam with AMORTIZED maintained entries
            # (build-time component+sqrt(n) recipe ∪ the in-degree-0
            # top-up: any node with no in-edge is provably unreachable
            # by the directed walk — the end-state form of
            # graph_search.append_entries' per-append rule) and record
            # the dial rule next to the built-graph rows. The per-call
            # 'component' default stays as the comparand.
            import math

            from pyspark_mrdf_spark.operators.graph_search import (
                component_entries,
                graph_knn_search,
            )

            qs = (
                corpus.orderBy(
                    F.md5(F.concat(F.lit("73:"), F.col("vec_id").cast("string")))
                )
                .limit(2000)
                .localCheckpoint(eager=True)
            )
            n_corpus = corpus.count()
            global_seeds = (
                corpus.orderBy(
                    F.md5(F.concat(F.lit("13:"), F.col("vec_id").cast("string")))
                )
                .limit(max(4, math.isqrt(max(n_corpus - 1, 0)) + 1))
                .select(F.col("vec_id").alias("vid"))
            )
            indeg0 = corpus.select(F.col("vec_id").alias("vid")).join(
                graph.select(F.col("dst").alias("vid")).distinct(),
                "vid", "left_anti",
            )
            ent = (
                component_entries(graph, corpus)
                .unionByName(global_seeds)
                .unionByName(indeg0)
                .distinct()
                .localCheckpoint(eager=True)
            )
            out["serve_entries"] = ent.count()
            out["serve_entries_indeg0_topup"] = indeg0.count()
            gt = knn_search_blocked(
                qs, corpus, K, n_blocks=32, n_query_blocks=4,
                include_self=False,
            ).localCheckpoint(eager=True)
            qid = [r["vec_id"] for r in qs.select("vec_id").collect()]
            sweep = []
            for beam, entry_frame, label in (
                (64, None, "component-per-call"),
                (64, ent, "amortized+topup"),
                (256, ent, "amortized+topup"),
                (1024, ent, "amortized+topup"),
            ):
                t0 = time.time()
                served = graph_knn_search(
                    qs, graph.select("src", "dst"), corpus, K, beam=beam,
                    include_self=False, entries=entry_frame,
                ).localCheckpoint(eager=True)
                served.count()
                row = {
                    "beam": beam, "entries": label,
                    "serve_batch_s": round(time.time() - t0, 2),
                    "serve_recall": round(
                        recall(
                            gt.select("src", "dst"),
                            served.filter(F.col("src").isin(qid)),
                        ),
                        4,
                    ),
                }
                sweep.append(row)
                print(f"[scalability] serve dial {row}", file=sys.stderr)
            out["serve_sweep"] = sweep
            # headline fields stay comparable with the r13 row
            out["serve_batch_s"] = sweep[0]["serve_batch_s"]
            out["serve_recall"] = sweep[0]["serve_recall"]
            out["serve_batch_size"] = 2000
    finally:
        shutil.rmtree(syn_dir, ignore_errors=True)
    return out


def _ivfpq_io_evidence(spark, n: int, d: int, n_cells: int = 64, n_probe: int = 2) -> dict:
    """The I/O-bound IVF-PQ claim, measured at the storage layer
    (VERDICT r9 ask #8): the persisted index's cell-partitioned layout
    turns the coarse-quantizer probe into PARQUET PARTITION PRUNING,
    so a low-latency serving batch reads only the probed cells'
    directories — bytes-scanned is the scan fraction, not the index.

    What the row records, honestly:
     - ``bytes_index`` vs ``bytes_probed_small`` — exact on-disk sizes
       of the whole code table vs the directories a SMALL (point-query)
       batch's probe set covers; parquet never opens the other
       directories, so this IS the I/O a cold object store would serve.
     - ``plan_partition_filters`` — the probed scan's formatted plan
       carries `PartitionFilters: [cell IN ...]`, proving the pruning
       is planner-enforced, not incidental.
     - scan wall-clocks for pruned vs full reads of the SAME table,
       fresh reader each rep. CAVEAT recorded in the row: local[32]
       serves repeat reads from the page cache, so the wall ratio here
       understates a cold-store deployment, where the bytes ratio
       converts to I/O time directly — that is why bytes, not seconds,
       is the headline of this row.
     - ``probed_cells_large_batch`` — a 2000-query batch's probe UNION
       typically covers most cells (pruning is a POINT-SERVING win,
       not a corpus-sweep win); recorded so the claim has its limits
       attached.
    """
    import tempfile

    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.functions.vector import pairwise_l2_sq
    from pyspark_mrdf_spark.operators.quantize import (
        build_ivfpq_index,
        ivfpq_search_encoded,
        read_ivfpq_index,
    )

    syn_dir = "/root/repo/.scalability_synth_ivfpq_io"
    small_batch, large_batch = 8, 2000
    ds_sub = 8
    n_sub = d // ds_sub
    out: dict = {
        "sf": f"synthetic-{n}x{d}-ivfpq-io", "n": n, "d": d,
        "ivfpq_cells": n_cells, "ivfpq_probe": n_probe,
        "small_batch": small_batch, "large_batch": large_batch,
        "caveat": (
            "wall ratios include the local page cache; bytes_probed/"
            "bytes_index is the deployment-transferable metric"
        ),
    }
    idx_root = tempfile.mkdtemp(prefix="mrdf_ivfpq_io_")
    try:
        _write_synthetic(syn_dir, n, d=d)
        emb = spark.read.parquet(os.path.join(syn_dir, "embeddings.parquet"))
        emb = emb.localCheckpoint(eager=True)

        t0 = time.time()
        build_ivfpq_index(
            emb, os.path.join(idx_root, "ivfpq"),
            n_centroids=n_cells, n_subspaces=n_sub,
            sample_size=max(4096, 16 * n_cells),
        )
        out["index_build_s"] = round(time.time() - t0, 2)
        coarse, cb, codes = read_ivfpq_index(spark, os.path.join(idx_root, "ivfpq"))
        codes_path = os.path.join(idx_root, "ivfpq", "codes")

        def du(path: str) -> int:
            total = 0
            for root, _dirs, files in os.walk(path):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
            return total

        def probed_cells(batch_n: int) -> list[int]:
            # replicate ivfpq_search_encoded's probe derivation exactly
            q = np.stack(
                [r["embedding"] for r in emb.filter(
                    F.col("vec_id") < batch_n).collect()]
            ).astype(np.float64)
            pr = np.argsort(pairwise_l2_sq(q, coarse), axis=1, kind="stable")[:, :n_probe]
            return [int(c) for c in np.unique(pr)]

        cells_small = probed_cells(small_batch)
        cells_large = probed_cells(large_batch)
        out["probed_cells_small_batch"] = len(cells_small)
        out["probed_cells_large_batch"] = len(cells_large)
        out["bytes_index"] = du(codes_path)
        out["bytes_probed_small"] = sum(
            du(os.path.join(codes_path, f"cell={c}")) for c in cells_small
        )
        out["bytes_probed_large"] = sum(
            du(os.path.join(codes_path, f"cell={c}")) for c in cells_large
        )
        out["bytes_fraction_small"] = round(
            out["bytes_probed_small"] / max(out["bytes_index"], 1), 4
        )

        # planner evidence: the probed scan prunes at PLAN time
        pruned = codes.filter(F.col("cell").isin(cells_small))
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = pruned._jdf.queryExecution().explainString(mode)
        out["plan_partition_filters"] = "PartitionFilters" in plan and "cell" in plan

        # scan walls: fresh DataFrameReader per rep so no Spark-side
        # caching; 3 reps each, median reported
        def scan_wall(cells: list[int] | None) -> float:
            reps = []
            for _ in range(3):
                r = spark.read.parquet(codes_path)
                if cells is not None:
                    r = r.filter(F.col("cell").isin(cells))
                t0 = time.time()
                r.agg(
                    F.count(F.lit(1)), F.sum(F.length("code")), F.sum("vec_id")
                ).collect()
                reps.append(time.time() - t0)
            return round(sorted(reps)[1], 3)

        out["scan_s_pruned_small"] = scan_wall(cells_small)
        out["scan_s_full"] = scan_wall(None)

        # end-to-end point-serving wall off the PERSISTED index (codes
        # read from disk inside the call, never checkpointed here)
        q_small = emb.filter(F.col("vec_id") < small_batch)
        t0 = time.time()
        ivfpq_search_encoded(
            q_small, codes, coarse, cb, emb, K,
            k_candidates=64 * K, n_probe=n_probe, include_self=False,
        ).localCheckpoint(eager=True)
        out["serve_small_batch_s"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(idx_root, ignore_errors=True)
        shutil.rmtree(syn_dir, ignore_errors=True)
    return out


def _graph_serving_evidence(spark, n: int, d: int, build: str = "exact") -> dict:
    """Measure graph-ANN serving (q124's batched beam search) against
    the exact scan for one query batch at design size: build the
    degree-10 exact graph once (timed — the index-build cost MRDF
    approximates at scale), then serve a 100-query batch both ways and
    record walls + recall. Recorded honestly whichever way it lands:
    on a single box Spark cannot point-read the corpus, so each beam
    round re-scans the (columnar) vector table — the regime where the
    graph walk wins outright is a deployment whose corpus is bucketed
    by id (round joins prune to touched buckets) or sharded across
    executors' memory, while the measured local value is the round
    count: corpus passes = graph diameter for the WHOLE batch."""
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.algorithms.mrdf import knn_graph
    from pyspark_mrdf_spark.operators.graph_search import graph_knn_search
    from pyspark_mrdf_spark.operators.similarity import knn_exact_blocked, knn_search

    syn_dir = "/root/repo/.scalability_synth_gsrv"
    suffix = "" if build == "exact" else f"-{build}"
    out: dict = {"sf": f"synthetic-{n}x{d}-graph-serving{suffix}", "n": n, "d": d,
                 "batch_queries": 100, "k": 5, "beam": 32, "build": build}
    try:
        _write_synthetic(syn_dir, n, d=d)
        emb = (
            spark.read.parquet(os.path.join(syn_dir, "embeddings.parquet"))
            .repartition(2 * spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)
        )
        t0 = time.time()
        if build == "mrdf":
            # the r10 verdict's ask #5: the serving graph does NOT need
            # the exhaustive n^2 build — MRDF's approximate kNN graph is
            # the scale path; the row records the serving-recall delta
            # vs the same exact-scan ground truth. Dial: alpha=4096
            # routes every leaf through the one-gemm exact tier (at
            # d=512 the 16384 tiled leaves measured 727 s — the leaf
            # quadratic is the whole build, so alpha is the cost dial)
            # max_iter=2: a serving graph only needs entry-reachable
            # neighborhoods (the beam re-ranks with true distances) —
            # the tau-driven build (284.6 s) and this capped one serve
            # at the same measured recall, so the extra forests buy
            # nothing here
            graph = (
                knn_graph(emb, 10, alpha=4096, max_iter=2)
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
        else:
            graph = (
                knn_exact_blocked(emb, 10)
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
        out["graph_build_s"] = round(time.time() - t0, 2)

        queries = emb.filter(F.col("vec_id") < 100).localCheckpoint(eager=True)
        exact_s, want = [], None
        for _ in range(2):
            t0 = time.time()
            want = knn_search(queries, emb, 5).localCheckpoint(eager=True)
            want.count()
            exact_s.append(round(time.time() - t0, 2))
        out["exact_batch_s"] = exact_s

        w = {}
        for r in want.collect():
            w.setdefault(r["src"], set()).add(r["dst"])

        def _run_graph(n_entry, key, strategy="component"):
            graph_s, got = [], None
            for _ in range(2):
                t0 = time.time()
                got = graph_knn_search(
                    queries, graph, emb, 5, beam=32, n_entry=n_entry,
                    entry_strategy=strategy,
                    # this row's claim is the DISTRIBUTED walk's scaling;
                    # auto would route the <=100k corpus to the local
                    # tier (bit-identical, tests) and silently change
                    # what the wall measures
                    route="distributed",
                ).localCheckpoint(eager=True)
                got.count()
                graph_s.append(round(time.time() - t0, 2))
            g = {}
            for r in got.collect():
                g.setdefault(r["src"], set()).add(r["dst"])
            hits = sum(len(g.get(s_, set()) & ds) for s_, ds in w.items())
            out[f"graph_batch_s{key}"] = graph_s
            out[f"graph_recall{key}"] = round(
                hits / sum(len(ds) for ds in w.values()), 4
            )

        # r12: the DEFAULT dial is component-aware (global sqrt-n md5
        # entries + one md5-argmin entry per graph component — exact
        # coverage, CC pass included in the measured wall). The
        # '_global' arm keeps the pre-r12 sqrt-n-only dial measurable
        # (the coupon-collector failure: sqrt(n)=224 entries over ~250
        # components -> ~0.50 recall); '_e1024' is the old hand dial
        # (~98% coverage) for continuity.
        from pyspark_mrdf_spark.operators.graph_search import component_entries

        t0 = time.time()
        out["n_components"] = component_entries(graph, emb).count()
        out["component_entries_s"] = round(time.time() - t0, 2)
        _run_graph(None, "")
        _run_graph(None, "_global", strategy="global")
        _run_graph(1024, "_e1024", strategy="global")
    finally:
        shutil.rmtree(syn_dir, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
