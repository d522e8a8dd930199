"""Scalar quantization (SQ8) for embedding corpora — the memory tier
of the similarity stack.

At 100 TB the ANN bottleneck is not flops but bytes: a float32
64-d embedding is 256 B/row, so a 10^11-row corpus is ~25 TB of raw
vectors that every scan must move. SQ8 stores one byte per dimension
(8x smaller than float64 working sets, 4x smaller than float32
parquet) packed into a single BINARY cell, and searches in the
quantized domain with pure uint8/int32 arithmetic — less memory
traffic per candidate AND an exactly-reproducible (integer) candidate
stage. Full-precision reranking then touches only candidate-sized
data, the same discipline as every other candidate-generation
operator in this engine (LSH, IVF, banding).

Determinism contract: codes are ``floor((v - mn) * 255 / (mx - mn)
+ 0.5)`` evaluated in float64 with exactly that association, so a SQL
engine computing the same expression derives bit-identical codes, and
the symmetric code-space distance is integer math — the whole
candidate stage hash-verifies cross-engine (q89's oracle). Constant
dimensions (mx == mn) encode as 0.

Reference parity note: the reference engine has no quantized tier —
this extends its W3/J7 exact-search surface (reference knn.py:4-26)
with the operator a memory-bound deployment needs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sq8_train(df: DataFrame, vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) over the corpus, as two float64 arrays.

    Distributed shape: posexplode -> groupBy(pos) min/max is a
    map-side-combined aggregate onto d keys — the only corpus-sized
    pass, and it moves d partial rows per task, never vectors. The
    result is O(d) driver state (the quantizer itself), like IVF's
    centroid table. min/max are order-independent, so the values are
    exact regardless of partitioning, and widening float32 inputs to
    float64 is value-preserving — the quantizer is engine-portable.
    """
    rows = (
        df.select(F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    )
    d = max(r["pos"] for r in rows) + 1
    mn = np.zeros(d, dtype=np.float64)
    mx = np.zeros(d, dtype=np.float64)
    for r in rows:
        mn[r["pos"]] = r["mn"]
        mx[r["pos"]] = r["mx"]
    return mn, mx


def sq8_codes(mat: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """Quantize a (n, d) float matrix to uint8 codes.

    The op order ``(v - mn) * 255.0 / rng + 0.5`` then ``floor`` is the
    determinism contract shared with q89's SQL oracle — do not
    re-associate it. Values inside [mn, mx] land in [0, 255] by
    construction; the clip only guards out-of-range QUERY vectors
    quantized against a corpus-trained quantizer."""
    rng = mx - mn
    safe = np.where(rng == 0.0, 1.0, rng)
    t = np.floor((mat.astype(np.float64) - mn) * 255.0 / safe + 0.5)
    t = np.where(rng == 0.0, 0.0, t)
    return np.clip(t, 0.0, 255.0).astype(np.uint8)


def sq8_encode(
    df: DataFrame,
    mn: np.ndarray,
    mx: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code binary): each row's d uint8 codes packed into one
    BINARY cell — the stored index representation (1 byte/dim).
    Arrow-batched; the quantizer rides along as a task-closure
    constant (O(d), like a broadcast literal)."""
    mn_b, mx_b = mn.copy(), mx.copy()

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy())
            codes = sq8_codes(mat, mn_b, mx_b)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "code": [c.tobytes() for c in codes],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(_enc, "vec_id long, code binary")


def sq8_candidates(
    queries: DataFrame,
    codes: DataFrame,
    k: int,
    mn: np.ndarray,
    mx: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
    n_parts: int | None = None,
) -> DataFrame:
    """Top-k candidates per query by symmetric code-space L2:
    (src, dst, code_dist) with integer ``code_dist`` = Σ_d (q_code_d −
    c_code_d)² — exact integer arithmetic, so the candidate set is
    bit-reproducible on any engine.

    Scale shape: the query side is collected and broadcast (bounded
    query sets — the external-search contract, same as ``knn_search``'s
    query side); the CODE corpus streams through ``mapInPandas``
    partition by partition at 1 byte/dim, each task emitting its local
    top-k per query; a final window merges the ≤ parts·k candidates
    per query — output-sized, never corpus-sized. Local top-k by
    (dist, id) is associative, so the merge is exact for any
    partitioning — but the MERGE INPUT is parts·k rows per query, so
    parallelism is a real dial: pass ``n_parts`` sized to ~16k-row
    code slabs (``sq8_search`` does) rather than one-task-per-core;
    code-slab tasks are cheap and an oversplit corpus pays its cost in
    the merge, not the scan."""
    spark = queries.sparkSession
    qpdf = queries.select(id_col, vec_col).toPandas()
    q_ids = qpdf[id_col].to_numpy(dtype=np.int64)
    q_codes = sq8_codes(np.stack(qpdf[vec_col].to_numpy()), mn, mx).astype(np.int32)
    b = spark.sparkContext.broadcast((q_ids, q_codes))

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qc = b.value
        qcf = qc.astype(np.float64)
        qq = (qc.astype(np.int64) ** 2).sum(axis=1).astype(np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c_mat = np.stack([np.frombuffer(x, dtype=np.uint8) for x in pdf["code"]])
            # corpus columns ordered by id so stable tie handling keeps
            # the LOWEST dst among equal distances (same discipline as
            # similarity._block_topk)
            c_order = np.argsort(c_ids, kind="stable")
            c_ids = c_ids[c_order]
            c_mat = c_mat[c_order]
            cc = (c_mat.astype(np.int64) ** 2).sum(axis=1).astype(np.float64)
            # rank within a row by g = ||c||² − 2q·c (the row-constant
            # ||q||² cannot change per-row order). EXACT in float64:
            # every dot/norm is an integer ≤ 255²·d ≪ 2^53, and float64
            # is also why this is fast — the gemm takes the BLAS path
            # (integer matmul has none) and the elementwise assembly is
            # SIMD (an int64 assembly of the full matrix measured 4.9s
            # per 5000×12500 task; this form ~0.5s)
            g = qcf @ c_mat.astype(np.float64).T
            g *= -2.0
            g += cc[None, :]
            if not include_self:
                g[qi[:, None] == c_ids[None, :]] = np.inf
            n_c = g.shape[1]
            kk = min(k, n_c)
            if kk < n_c:
                # select on g·n_c + column_index, NOT on g: quantized
                # distances tie massively (256 code levels/dim) and
                # introselect degrades ~6× on duplicate-heavy keys —
                # folding in the id-ordered column index makes every
                # key unique (fast) AND breaks ties to the lowest dst
                # deterministically, so no redo pass exists. Exact in
                # float64: |g| ≤ 2·d·255² and j < n_c keep
                # |g|·n_c + j ≪ 2^53 for any real slab/dim size
                key = g * float(n_c)
                key += np.arange(n_c, dtype=np.float64)[None, :]
                sel = np.argpartition(key, kk - 1, axis=1)[:, :kk]
            else:
                sel = np.broadcast_to(np.arange(n_c), (g.shape[0], n_c)).copy()
            gs = np.take_along_axis(g, sel, axis=1)
            m = np.isfinite(gs)  # masked self rows in short partitions
            dist = (gs + qq[:, None])[m].astype(np.int64)
            src = np.repeat(qi, sel.shape[1]).reshape(sel.shape)[m]
            yield pd.DataFrame(
                {"src": src, "dst": c_ids[sel][m], "code_dist": dist}
            )

    if n_parts is not None and n_parts != codes.rdd.getNumPartitions():
        codes = codes.repartition(n_parts)
    cand = codes.mapInPandas(_scan, "src long, dst long, code_dist long")
    wk = Window.partitionBy("src").orderBy("code_dist", "dst")
    return (
        cand.withColumn("crnk", F.row_number().over(wk))
        .filter(F.col("crnk") <= k)
        .drop("crnk")
    )


def sq8_search(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    k_candidates: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """End-to-end quantized search: train the SQ8 quantizer on the
    corpus, encode it to packed codes, generate ``k_candidates``
    (default 4k) per query in the integer code domain, then rerank the
    candidates at full precision — (src, dst, rnk) with rnk 1..k by
    (exact dist_sq, dst), the ``knn_search`` output contract.

    Everything after the one-pass quantizer training is either
    1-byte/dim streaming (candidates) or candidate-sized (the rerank
    join) — the memory-bound profile a 100 TB corpus needs. Recall
    loss vs exact is bounded by quantization error only (≤ rng/255
    per dim); on clustered corpora SQ8@4k candidates is near-exact."""
    if k_candidates is None:
        k_candidates = 4 * k
    mn, mx = sq8_train(corpus, vec_col)
    # materialize the code table — it IS the stored index a deployment
    # keeps — and spread the scan over every core with slabs capped at
    # ~16k rows: scan flops dominate the candidate merge at every
    # measured shape (a 7-slab run costs 5-30s where 32 slabs cost
    # ~2s at n=50k; the 6.4M-row merge those 32 slabs produce is ~1s),
    # so parallelism is the binding constraint, not merge input
    codes = sq8_encode(corpus, mn, mx, id_col, vec_col).localCheckpoint(eager=False)
    n_codes = codes.count()
    n_parts = max(
        corpus.sparkSession.sparkContext.defaultParallelism,
        -(-n_codes // 16_384),
    )
    cand = sq8_candidates(
        queries, codes, k_candidates, mn, mx, id_col, vec_col, include_self,
        n_parts=n_parts,
    )
    qv = queries.select(F.col(id_col).alias("src"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("c_vec"))
    from pyspark_mrdf_spark.functions.vector import l2_sq

    rr = (
        cand.join(F.broadcast(qv), "src")
        .join(cv, "dst")
        .withColumn("dist_sq", l2_sq("q_vec", "c_vec"))
    )
    wk = Window.partitionBy("src").orderBy("dist_sq", "dst")
    return (
        rr.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select("src", "dst", "dist_sq", F.col("rnk").cast("int").alias("rnk"))
    )
