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
    partitioning."""
    spark = queries.sparkSession
    qpdf = queries.select(id_col, vec_col).toPandas()
    q_ids = qpdf[id_col].to_numpy(dtype=np.int64)
    q_codes = sq8_codes(np.stack(qpdf[vec_col].to_numpy()), mn, mx).astype(np.int32)
    b = spark.sparkContext.broadcast((q_ids, q_codes))

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qc = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c_mat = np.stack(
                [np.frombuffer(x, dtype=np.uint8) for x in pdf["code"]]
            ).astype(np.int32)
            # ||q-c||² = ||q||² - 2q·c + ||c||² in int64 — exact (codes
            # ≤ 255, d ≤ ~1e4 keeps every term far below 2^63)
            qq = (qc.astype(np.int64) ** 2).sum(axis=1)
            cc = (c_mat.astype(np.int64) ** 2).sum(axis=1)
            dist = qq[:, None] - 2 * (qc.astype(np.int64) @ c_mat.astype(np.int64).T) + cc[None, :]
            if not include_self:
                dist[q_ids[:, None] == c_ids[None, :]] = np.iinfo(np.int64).max
            kk = min(k, dist.shape[1])
            idx = np.argpartition(dist, kk - 1, axis=1)[:, :kk]
            out_src, out_dst, out_d = [], [], []
            for r in range(dist.shape[0]):
                cols = idx[r]
                out_src.append(np.full(kk, qi[r], dtype=np.int64))
                out_dst.append(c_ids[cols])
                out_d.append(dist[r, cols])
            yield pd.DataFrame(
                {
                    "src": np.concatenate(out_src),
                    "dst": np.concatenate(out_dst),
                    "code_dist": np.concatenate(out_d),
                }
            )

    cand = codes.mapInPandas(_scan, "src long, dst long, code_dist long")
    if not include_self:
        # a sentinel self-row can survive the local top-k only when a
        # partition has fewer than k other rows — drop it before merge
        cand = cand.filter(F.col("code_dist") < np.iinfo(np.int64).max)
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
    codes = sq8_encode(corpus, mn, mx, id_col, vec_col)
    cand = sq8_candidates(
        queries, codes, k_candidates, mn, mx, id_col, vec_col, include_self
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
