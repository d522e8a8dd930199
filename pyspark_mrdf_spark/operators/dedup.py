"""Deduplication operators over a text column (north-star "dedup").

Five tiers, cheapest first — a real 100 TB dedup pipeline runs them in
this order, each pruning the candidate space for the next:

 1. ``exact_duplicates`` — md5 fingerprint groupBy; one shuffle on a
    16-byte key regardless of document size.
 2. ``simhash`` — 16-bit locality-sensitive token-set signature; docs
    with equal/near signatures are near-dup candidates.
 3. ``minhash_signatures`` + ``lsh_band_buckets`` — MinHash-LSH:
    banded signatures make the candidate join an equi-join on bucket
    id (no all-pairs anything).
 4. ``jaccard_pairs`` — exact n-gram Jaccard verification via a
    shingle-posting-list self-join (the verify step after 2/3 prune).
 5. embedding-cosine near-dup — see ``operators.similarity`` (k=1
    exact or IVF search).

Portability discipline: every hash here is md5 (identical hex across
Spark and DuckDB) — NOT Spark's xxhash64/hash, which no oracle could
reproduce. MinHash uses the textbook "min over a hashed permutation"
with the permutation keyed by a salt prefix: sig_i = min over
shingles of md5(i || ':' || shingle), compared as hex strings.
Jaccard values are int/int divisions — bit-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_mrdf_spark.functions.text import fingerprint, shingles


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (fingerprint, n_copies,
    doc_ids ascending), only groups with ≥ 2 members."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.array_sort(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_copies") >= 2)
    )


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a (possibly single-file) input across the cluster
    before per-document expression work: shingling/hashing are
    interpreted higher-order functions, and a one-file table would run
    them all in one task."""
    n = max(
        df.sparkSession.sparkContext.defaultParallelism, df.rdd.getNumPartitions()
    )
    return df.repartition(n)


def shingle_table(df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Posting-list form: one row per (doc, distinct shingle)."""
    return _spread(df).select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Pairwise n-gram Jaccard for every pair sharing ≥1 shingle:
    (doc_a < doc_b, inter, size_a, size_b, jaccard).

    The self-join is on the shingle posting list, so only pairs with
    overlap are ever materialized — at scale, hot shingles should be
    stop-listed (drop shingles with document frequency above a cap)
    to bound the join fan-out.

    Set sizes are derived FROM the posting table (groupBy count), not
    recomputed from text: the shingle expression is a Catalyst
    higher-order function (interpreted per element), so it should run
    once; the two join branches share one exchange via ReusedExchange."""
    post = shingle_table(df, n, id_col, text_col)
    sizes = post.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if max_df is not None:
        # stoplist hot shingles: a shingle appearing in > max_df docs
        # contributes O(df²) join rows but almost no Jaccard signal.
        # Set sizes stay TRUE sizes (computed above, pre-filter), so
        # capped Jaccard is a strict under-estimate — candidates only.
        hot = (
            post.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        post = post.join(F.broadcast(hot), "shingle", "left_anti")
    a = post.select(F.col(id_col).alias("doc_a"), "shingle")
    b = post.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("size_a")), "doc_a")
        .join(sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("size_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "size_a",
            "size_b",
            (
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter"))
            ).alias("jaccard"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signature per document: sig[i] = min md5(i || ':' || s)
    over the doc's n-gram shingles, as hex strings."""
    post = shingle_table(df, n, id_col, text_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = post.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature"),
    )


def lsh_band_buckets(
    sig: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
    sig_col: str = "signature",
) -> DataFrame:
    """Banded LSH buckets: (doc_id, band, bucket) where bucket is the
    md5 of the band's concatenated signature slice. Candidate pairs =
    equi-join on (band, bucket)."""
    out = None
    for band in range(bands):
        b = sig.select(
            F.col(id_col),
            F.lit(band).alias("band"),
            F.md5(
                F.concat_ws("|", F.slice(F.col(sig_col), band * rows_per_band + 1, rows_per_band))
            ).alias("bucket"),
        )
        out = b if out is None else out.unionByName(b)
    return out


def lsh_candidate_pairs(buckets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs sharing any band bucket."""
    a = buckets.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    b = buckets.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash(
    df: DataFrame,
    bits: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash over whitespace tokens (with multiplicity): bit j is the
    sign of Σ_tokens (parity(hex_j(md5(token)))·2 − 1); the j-th hex
    char of the token's md5 supplies bit j's ±1 vote. Returns
    (doc_id, simhash int)."""
    tok = _spread(df).select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    h = F.md5(F.col("tok"))
    # parity of hex digit j of the token hash supplies bit j's ±1 vote
    aggs = []
    for j in range(bits):
        val = F.conv(F.substring(h, j + 1, 1), 16, 10).cast("int")
        vote = (val % 2) * 2 - 1
        aggs.append(F.sum(vote).alias(f"s{j}"))
    sums = tok.groupBy(id_col).agg(*aggs)
    sim = None
    for j in range(bits):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return sums.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (src, dst, cos_e6) with
    src < dst and cosine ≥ threshold.

    Exact variant: distributed block scan — each Arrow batch of rows
    computes a vectorized cosine block against the broadcast corpus
    matrix (query partitions parallelize; O(n²d) flops total, the
    honest cost of exact near-dup). Scale path for n where n² is
    infeasible: LSH candidates (``lsh_candidate_pairs`` or random
    hyperplane buckets) first, then this kernel on candidates only.

    Cosines are fixed-point-rounded to 1e-6 BEFORE thresholding, so the
    selected pair set is reproducible across engines (a last-ulp float
    difference cannot flip membership)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import LongType, StructField, StructType

    from pyspark_mrdf_spark.operators.similarity import collect_matrix

    spark = df.sparkSession
    ids, mat = collect_matrix(df, id_col, vec_col)
    b = spark.sparkContext.broadcast((ids, mat))
    t_e6 = int(round(threshold * 1e6))
    schema = StructType(
        [
            StructField("src", LongType(), False),
            StructField("dst", LongType(), False),
            StructField("cos_e6", LongType(), False),
        ]
    )

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat = b.value
        c_norm = np.linalg.norm(c_mat, axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q_mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q_norm = np.linalg.norm(q_mat, axis=1)
            # dot / (|a||b|): same formula as the oracle's
            # list_cosine_similarity — divergence stays ~1 ulp
            cos = (q_mat @ c_mat.T) / np.outer(q_norm, c_norm)
            cos_e6 = np.rint(cos * 1e6).astype(np.int64)
            keep = (cos_e6 >= t_e6) & (q_ids[:, None] < c_ids[None, :])
            ii, jj = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "src": q_ids[ii],
                    "dst": c_ids[jj],
                    "cos_e6": cos_e6[ii, jj],
                }
            )

    n_parts = max(
        spark.sparkContext.defaultParallelism, df.rdd.getNumPartitions()
    )
    return df.select(id_col, vec_col).repartition(n_parts).mapInPandas(_scan, schema)


def simhash_band_candidates(
    sh: DataFrame,
    bands: int = 3,
    bits: int = 16,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
) -> DataFrame:
    """Banded SimHash candidate pairs: split the ``bits``-bit signature
    into ``bands`` contiguous slices and equi-join on (band, slice
    value). Pigeonhole guarantee: any pair within Hamming distance
    ``bands - 1`` differs in at most bands-1 slices, so at least one
    slice matches — no false negatives up to that radius, and the
    all-pairs bit_count scan of the verify step runs only on
    candidates. This is the scale path for ``simhash`` near-dup
    (the exact variant joins all pairs)."""
    width = bits // bands
    out = None
    for band in range(bands):
        lo = band * width
        w = width + (bits - bands * width if band == bands - 1 else 0)
        slice_val = F.shiftright(F.col(sim_col), lo).bitwiseAND(F.lit((1 << w) - 1))
        b = sh.select(
            F.col(id_col), F.lit(band).alias("band"), slice_val.alias("slice")
        )
        out = b if out is None else out.unionByName(b)
    a = out.select(F.col(id_col).alias("doc_a"), "band", "slice")
    bb = out.select(F.col(id_col).alias("doc_b"), "band", "slice")
    return (
        a.join(bb, ["band", "slice"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def dedup_against(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental exact dedup: rows of ``new_docs`` whose text
    fingerprint is NOT already in ``corpus`` (and not duplicated within
    the batch — lowest id wins). The daily-ingest shape: the corpus
    side reduces to a fingerprint set (16-byte keys), so the join
    shuffles hashes, never documents."""
    corpus_fp = corpus.select(fingerprint(text_col).alias("fp")).distinct()
    batch = new_docs.withColumn("fp", fingerprint(text_col))
    in_batch_first = batch.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return (
        batch.join(in_batch_first, [id_col, "fp"], "left_semi")
        .join(corpus_fp, "fp", "left_anti")
        .drop("fp")
    )
