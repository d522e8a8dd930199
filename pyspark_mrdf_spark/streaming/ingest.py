"""Continuous corpus ingestion with exact dedup — the streaming twin
of the q77 daily-ingest batch path (`operators/dedup.dedup_against`):
documents arrive as a stream, each micro-batch drops what the stored
corpus already has (and in-batch duplicates, lowest id winning), and
the survivors append to the corpus — so later batches dedupe against
everything earlier batches admitted.

Exactly-once without a table format: each batch writes its survivors
to a batch-id-named partition directory (`batch=<id>`), so a replayed
batch after a crash OVERWRITES its own directory instead of
double-appending — the write is idempotent per batch id, and the
corpus is the union of committed partitions. The replayed batch also
EXCLUDES its own partition from the dedup corpus (it may exist from
the crashed attempt; deduping against it would empty the survivor set
and the overwrite would lose the batch) — so a rerun sees exactly the
corpus the original run saw. At production scale the
same logic targets Delta/Iceberg `MERGE INTO` where the commit is a
metadata operation; the fingerprint semi-join shape is identical.

Scale shape: the corpus side of the dedup join reduces to DISTINCT
16-byte fingerprints (never documents), the batch side is
micro-batch-sized, and the append touches only the new partition —
per-batch cost is O(batch + corpus fingerprints), with the
fingerprint scan pruned to the `fp` column by parquet column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_mrdf_spark.streaming.sinks import _hadoop_fs


def _in_batch_exact_dedup(batch_df: DataFrame) -> DataFrame:
    """Lowest id per identical text within one micro-batch (q77's
    in-batch rule), using the SAME ``fingerprint`` the batch operators
    hash with — one definition, so the streams cannot drift from the
    batch verdicts if the fingerprint function ever changes."""
    from pyspark_mrdf_spark.functions.text import fingerprint

    first = batch_df.groupBy(fingerprint("text").alias("_fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    return (
        batch_df.withColumn("_fp", fingerprint("text"))
        .join(first, ["doc_id", "_fp"], "left_semi")
        .drop("_fp")
    )


def ingest_dedup_stream(
    docs: DataFrame,
    corpus_path: str,
    checkpoint: str,
    query_name: str = "ingest_dedup",
):
    """Start the ingestion query (caller awaits termination).

    ``docs`` is a streaming DataFrame with at least (doc_id, text);
    every column is carried through to the corpus. Returns the
    StreamingQuery."""
    from pyspark_mrdf_spark.operators.dedup import dedup_against

    spark = docs.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        fs, base = _hadoop_fs(spark, corpus_path)
        part_path = f"{corpus_path.rstrip('/')}/batch={batch_id}"
        if fs.exists(base) and len(fs.listStatus(base)) > 0:
            corpus = spark.read.option("basePath", corpus_path).parquet(corpus_path)
            # a REPLAYED batch (crash between the parquet write and the
            # checkpoint commit) must not dedupe against its own
            # partially/fully written partition — that would drop every
            # row as already-admitted and then overwrite the partition
            # with the empty survivor set, losing the batch. Excluding
            # batch=<id> makes replay truly idempotent: the rerun sees
            # exactly the corpus the original run saw.
            corpus = corpus.filter(F.col("batch") != batch_id).drop("batch")
            survivors = dedup_against(batch_df, corpus)
        else:
            # first batch: in-batch dedup only (lowest id per text)
            survivors = _in_batch_exact_dedup(batch_df)
        # idempotent append: a replayed batch overwrites ITS OWN
        # partition directory — never double-admits
        survivors.write.mode("overwrite").parquet(part_path)

    return (
        docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def index_append_stream(
    vectors: DataFrame,
    index_path: str,
    checkpoint: str,
    query_name: str = "index_append",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Streaming ANN-index maintenance — the streaming twin of
    ``append_sq8_index``: each micro-batch of newly embedded vectors
    is encoded with the index's FROZEN persisted quantizer (no
    retrain, no re-encode of the stored corpus) and lands as the
    batch-id partition ``stream_codes/batch=<id>`` of the index
    directory. Same exactly-once construction as
    ``ingest_dedup_stream``: a replayed batch overwrites its own
    partition instead of double-appending, so the stored index is the
    union of committed partitions and ``read_sq8_index`` serves base
    + streamed codes transparently.

    Because the quantizer is frozen, a streamed index is bit-identical
    to batch-appending the same vectors (equivalence-tested), and the
    retrain trigger stays where it is for the batch path: watch
    ``index_cell_stats``-style occupancy/clip-rate monitors and
    rebuild on schedule. Per-batch cost is O(batch) encode + one
    partition write — no corpus-sized work at any batch."""
    from pyspark_mrdf_spark.operators.quantize import _read_params, sq8_encode

    base = index_path.rstrip("/")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        p = _read_params(index_path)
        codes = sq8_encode(batch_df, p["mn"], p["mx"], id_col, vec_col)
        codes.write.mode("overwrite").parquet(f"{base}/stream_codes/batch={batch_id}")

    return (
        vectors.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def near_ingest_dedup_stream(
    docs: DataFrame,
    index_path: str,
    corpus_path: str,
    checkpoint: str,
    threshold: float = 0.5,
    query_name: str = "near_ingest_dedup",
):
    """Continuous corpus ingestion with NEAR-dup dedup served off the
    persisted dedup index — the streaming twin of the q122 batch loop
    (``operators/dedup_index``: ``near_dedup_against_index`` +
    ``append_dedup_index``), completing the ingest family:
    ``ingest_dedup_stream`` = exact tier over a grown corpus,
    ``index_append_stream`` = ANN-index maintenance, this = fuzzy tier
    over a grown INDEX.

    The index must exist before the stream starts (``write_dedup_index``
    on the seed corpus — its banding params are FROZEN for the life of
    the stream, the quantizer-freezing discipline). Each micro-batch:
    exact in-batch dedup (lowest id per identical text, q77's rule;
    in-batch NEAR pairs pass through, matching the batch operator's
    batch-vs-corpus semantics), then ``near_dedup_against_index``
    against base + all OTHER committed stream partitions — the
    self-exclusion keeps a crash-replayed batch from deduping against
    its own partial writes (see ``ingest_dedup_stream``). Survivor
    docs land in ``corpus_path/batch=<id>``; their fps/buckets/
    postings land in ``stream_<table>/batch=<id>`` under the index —
    all four writes idempotent per batch id, so the stream is
    exactly-once per committed checkpoint batch, and ``read_dedup_index``
    serves base + streamed state transparently (row-identical to batch
    ``append_dedup_index`` of the same survivors; equivalence-tested).

    Per-batch cost: batch-sized encode + candidate-pruned verify + one
    partition write per table — no corpus-sized recompute at any batch."""
    from pyspark_mrdf_spark.operators.dedup_index import (
        _index_state,
        _read_dedup_params,
        near_dedup_against_index,
        read_dedup_index,
    )

    spark = docs.sparkSession
    idx_base = index_path.rstrip("/")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_dedup = _in_batch_exact_dedup(batch_df)
        idx = read_dedup_index(spark, index_path, _exclude_stream_batch=batch_id)
        survivors = near_dedup_against_index(batch_dedup, idx, threshold)
        part = f"{corpus_path.rstrip('/')}/batch={batch_id}"
        survivors.write.mode("overwrite").parquet(part)
        # derive the index state from the WRITTEN partition (one dedup
        # computation, and the three index writes see exactly the rows
        # the corpus write committed)
        admitted = spark.read.parquet(part).select("doc_id", "text")
        p = _read_dedup_params(index_path)
        fps, buckets, postings = _index_state(
            admitted, p["num_hashes"], p["bands"], p["rows_per_band"], p["n"],
            "doc_id", "text",
        )
        fps.write.mode("overwrite").parquet(f"{idx_base}/stream_fps/batch={batch_id}")
        # band-partitioned like the base build and batch appends, so a
        # streamed-into index keeps the same storage-level layout
        buckets.write.mode("overwrite").partitionBy("band").parquet(
            f"{idx_base}/stream_buckets/batch={batch_id}"
        )
        postings.write.mode("overwrite").parquet(
            f"{idx_base}/stream_postings/batch={batch_id}"
        )

    return (
        docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def write_graph_state(
    corpus: DataFrame,
    graph: DataFrame,
    state_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Seed the persisted state ``graph_append_stream`` maintains:
    ``corpus/base`` (id, vector — extra columns dropped so streamed
    batch partitions union cleanly) + ``graph/base`` (src, dst,
    dist_sq, rnk — any rank-carrying in-engine graph builder's
    output). One-time, before the stream starts — the
    ``write_dedup_index``-before-``near_ingest_dedup_stream``
    discipline."""
    base = state_path.rstrip("/")
    corpus.select(id_col, vec_col).write.mode("overwrite").parquet(
        f"{base}/corpus/base"
    )
    graph.select("src", "dst", "dist_sq", "rnk").write.mode(
        "overwrite"
    ).parquet(f"{base}/graph/base")


def read_graph_state(
    spark,
    state_path: str,
    _exclude_stream_batch: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(corpus, graph) as served from the persisted state: corpus =
    base + every committed vector micro-batch; graph = base overlaid
    with the per-batch REPLACEMENT deltas, LATEST delta winning per
    src (``knn_graph_append(return_delta=True)``'s contract: a delta
    row set replaces its src's whole adjacency). The overlay is one
    src-keyed max-batch join over the O(n·k) edge rows — paid at
    serve/maintenance time, not per delta row; a compaction pass
    (fold the resolved graph into ``graph/base`` and clear deltas)
    bounds delta count exactly like the SQ8 single-source merge.

    ``_exclude_stream_batch``: replay idempotency (the
    ``ingest_dedup_stream`` rule) — a crash-replayed batch must see
    exactly the state the original attempt saw, so its own (possibly
    partially written) partitions are excluded from both reads.

    Delta growth is bounded by ``compact_graph_state`` (below), not by
    hand-rebuilding base."""
    from pyspark_mrdf_spark.streaming.sinks import _hadoop_fs

    base = state_path.rstrip("/")
    corpus = spark.read.parquet(f"{base}/corpus/base")
    graph = spark.read.parquet(f"{base}/graph/base").withColumn(
        "_b", F.lit(-1).cast("long")
    )
    stream_corpus = f"{base}/corpus/stream"
    fs, p = _hadoop_fs(spark, stream_corpus)
    if fs.exists(p) and len(fs.listStatus(p)) > 0:
        sc = spark.read.option("basePath", stream_corpus).parquet(stream_corpus)
        if _exclude_stream_batch is not None:
            sc = sc.filter(F.col("batch") != _exclude_stream_batch)
        corpus = corpus.unionByName(sc.drop("batch"))
    stream_graph = f"{base}/graph/stream"
    fs, p = _hadoop_fs(spark, stream_graph)
    if fs.exists(p) and len(fs.listStatus(p)) > 0:
        sg = spark.read.option("basePath", stream_graph).parquet(stream_graph)
        if _exclude_stream_batch is not None:
            sg = sg.filter(F.col("batch") != _exclude_stream_batch)
        graph = graph.unionByName(
            sg.select(
                "src", "dst", "dist_sq", "rnk",
                F.col("batch").cast("long").alias("_b"),
            )
        )
        latest = graph.groupBy("src").agg(F.max("_b").alias("_b"))
        graph = graph.join(latest, ["src", "_b"])
    return corpus, graph.select("src", "dst", "dist_sq", "rnk")


def compact_graph_state(spark, state_path: str, dst_path: str) -> None:
    """Fold ``state_path``'s base + every committed stream delta into
    a FRESH single-base state at ``dst_path`` — the
    ``merge_sq8_indexes`` single-source COMPACTION pattern
    (operators/quantize.py), including the guarded not-in-place
    contract.

    Why it exists: ``read_graph_state`` pays one ``unionByName`` +
    latest-wins overlay join per serve/maintenance read, LINEAR in
    committed delta count — a long-running ``graph_append_stream``
    accumulates deltas without bound, and each is a small file (the
    many-small-files scan tax on top of the overlay). Compaction folds
    the RESOLVED graph into ``graph/base`` and the streamed vectors
    into ``corpus/base``, so the overlay restarts empty; serving reads
    off the compacted state are row-identical to the uncompacted
    overlay (equivalence-tested).

    Caller contract (same discipline as the SQ8 single-source merge):
     - ``dst_path`` must be a fresh directory — compacting in place
       would overwrite ``graph/base`` while lazily reading it
       (guarded; swap dst into place after the write commits).
     - Run while the stream is QUIESCENT (cleanly stopped, or between
       ``availableNow`` drains with no uncommitted batch): a batch
       that crashed mid-write and later REPLAYS must read state with
       its own partitions excluded, which is impossible once they are
       folded into base. A cleanly stopped stream has no such batch.
       Restart the stream against ``dst_path`` with the SAME
       checkpoint — subsequent batch ids are strictly newer than every
       folded one, so the exclusion contract stays intact
       (checkpoint-restart-tested across a compaction)."""
    import os

    def canon(p: str) -> str:
        return os.path.abspath(p) if "://" not in p else p.rstrip("/")

    if canon(state_path) == canon(dst_path):
        raise ValueError(
            f"compact_graph_state: dst_path {dst_path!r} is the source state "
            "— compact into a fresh directory, then swap it into place"
        )
    corpus, graph = read_graph_state(spark, state_path)
    dst = dst_path.rstrip("/")
    corpus.write.mode("overwrite").parquet(f"{dst}/corpus/base")
    graph.select("src", "dst", "dist_sq", "rnk").write.mode(
        "overwrite"
    ).parquet(f"{dst}/graph/base")


def graph_append_stream(
    vectors: DataFrame,
    state_path: str,
    checkpoint: str,
    k: int,
    mode: str = "graph",
    query_name: str = "graph_append",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **append_kwargs,
):
    """Streaming kNN-graph maintenance — the micro-batch twin of
    ``knn_graph_append`` (the third leg of the ingest family:
    ``ingest_dedup_stream`` = corpus dedup, ``index_append_stream`` =
    quantized-index growth, this = the SERVED GRAPH itself). Each
    vector micro-batch folds into the persisted graph state: the batch
    walks the current graph for candidates (graph tier — the old
    corpus is never rescanned), and exactly two O(batch)-row
    partitions land per batch id — the vectors
    (``corpus/stream/batch=<id>``) and the replacement delta
    (``graph/stream/batch=<id>``). Exactly-once by the established
    construction: a replayed batch OVERWRITES its own partitions and
    reads state with itself excluded, so replay is idempotent
    (checkpoint-restart-tested); ``read_graph_state`` serves base +
    deltas latest-wins, equivalent to chaining batch
    ``knn_graph_append`` calls (equivalence-tested, bit-identical on
    the exact tier).

    The state round-trips through parquet every batch, so each fold
    plans on REAL file statistics — the stats-compounding failure the
    batch chain needed ``materialize=True`` for cannot arise here.

    Drift contract: same as batch chaining — graph-tier folds walk an
    approximate graph, so sampled recall decays slowly (measured ~1%
    per 2% batch at n=100k); monitor with the sampled-GT estimator
    and rebuild ``graph/base`` (+ clear deltas) when the ratio crosses
    the retrain dial."""
    from pyspark_mrdf_spark.algorithms.graph_append import knn_graph_append

    spark = vectors.sparkSession
    base = state_path.rstrip("/")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        corpus, graph = read_graph_state(
            spark, state_path, _exclude_stream_batch=batch_id
        )
        delta = knn_graph_append(
            graph, corpus, batch_df, k, mode=mode,
            id_col=id_col, vec_col=vec_col, return_delta=True,
            **append_kwargs,
        )
        # corpus FIRST, graph delta second: a crash between the two
        # writes then leaves a serving-time read_graph_state (no batch
        # exclusion) at worst consistently STALE — a graph over a
        # corpus superset — never a graph whose delta rows reference
        # vec_ids absent from the corpus (the dangling-edge window the
        # reverse order had until the stream replayed the batch).
        batch_df.select(id_col, vec_col).write.mode("overwrite").parquet(
            f"{base}/corpus/stream/batch={batch_id}"
        )
        delta.write.mode("overwrite").parquet(
            f"{base}/graph/stream/batch={batch_id}"
        )

    return (
        vectors.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
