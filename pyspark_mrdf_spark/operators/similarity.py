"""Similarity search operators over an embedding column.

 - ``knn_exact``: brute-force exact k-NN graph — the engine's
   correctness oracle, re-expressing reference knn.py:4-26. The
   reference broadcast the whole dataset as a Python dict and scanned
   it row-at-a-time per vector (knn.py:7,12-26); here the corpus
   matrix is a single NumPy broadcast and each Arrow batch of queries
   computes a vectorized distance block (O(n²d) flops stay, Python
   overhead goes). Scale path: brute force is inherently quadratic —
   for large n use ``ann_ivf`` (bucketed) or MRDF (algorithms.mrdf).
 - ``ann_ivf``: IVF-style approximate search — deterministic coarse
   centroids, cluster assignment, then exact search within probed
   clusters. All relational plumbing is DataFrame ops; only the
   distance kernel is NumPy.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from pyspark_mrdf_spark.functions.vector import pairwise_l2_sq

KNN_SCHEMA = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("dist_sq", DoubleType(), False),
        StructField("rnk", IntegerType(), False),
    ]
)


def collect_matrix(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Corpus matrix (ids, float64 matrix) for broadcasting.

    Deliberately driver-side: the IVF/MRDF paths exist precisely so
    that only brute-force (small-corpus) search needs this."""
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def knn_exact(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Exact k-NN graph: (src, dst, dist_sq, rnk), rnk 1..k ascending
    by (dist_sq, dst). Distributed over query partitions; corpus is a
    broadcast float64 matrix (reference knn.py:7 broadcast, vectorized)."""
    spark = df.sparkSession
    ids, mat = collect_matrix(df, id_col, vec_col)
    b = spark.sparkContext.broadcast((ids, mat))

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q_mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = pairwise_l2_sq(q_mat, c_mat)
            n = c_mat.shape[0]
            kk = min(k + (0 if include_self else 1), n)
            # argpartition prunes to kk candidates, then an exact
            # (dist, id) lexsort of just those — O(n + k log k) per row.
            part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            rows: list[tuple[int, int, float, int]] = []
            for i in range(len(q_ids)):
                cand = part[i]
                order = cand[np.lexsort((c_ids[cand], d2[i, cand]))]
                rnk = 0
                for j in order:
                    if not include_self and c_ids[j] == q_ids[i]:
                        continue
                    rnk += 1
                    rows.append((int(q_ids[i]), int(c_ids[j]), float(d2[i, j]), rnk))
                    if rnk == k:
                        break
            yield pd.DataFrame(rows, columns=["src", "dst", "dist_sq", "rnk"])

    return df.select(id_col, vec_col).mapInPandas(_scan, KNN_SCHEMA)


def ann_ivf(
    df: DataFrame,
    k: int,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate k-NN: deterministic coarse quantizer (the
    ``n_centroids`` lowest-id vectors — reproducible across engines,
    no k-means randomness), assign every vector to its nearest
    centroid, then search exactly within each query's ``n_probe``
    nearest clusters.

    Pure DataFrame plumbing: centroid assignment is a broadcast join +
    min_by over a tiny cross product; the refine step shuffles once on
    cluster id. At scale, cluster sizes ≈ n/n_centroids bound the
    quadratic term, and the probe join replaces the all-pairs scan.
    Returns (src, dst, dist_sq, rnk) like ``knn_exact``.
    """
    from pyspark_mrdf_spark.functions.vector import l2_sq

    cent = (
        df.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("cent_vec"),
        )
    )
    # nearest centroid per vector (broadcast n_centroids rows)
    assigned = (
        df.crossJoin(F.broadcast(cent))
        .withColumn("cdist", l2_sq(vec_col, "cent_vec"))
        .groupBy(id_col, vec_col)
        .agg(F.min_by("cent_id", F.struct("cdist", "cent_id")).alias("cluster"))
    )
    # per-query probe list: n_probe nearest centroids
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("cdist", "cent_id")
    probes = (
        df.crossJoin(F.broadcast(cent))
        .withColumn("cdist", l2_sq(vec_col, "cent_vec"))
        .withColumn("probe_rnk", F.row_number().over(w))
        .filter(F.col("probe_rnk") <= n_probe)
        .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), F.col("cent_id").alias("cluster"))
    )
    # search: join queries to members of probed clusters, exact top-k
    cand = probes.join(
        assigned.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"), "cluster"),
        "cluster",
    ).filter(F.col("q_id") != F.col("c_id"))
    scored = cand.withColumn("dist_sq", l2_sq("q_vec", "c_vec"))
    wk = Window.partitionBy("q_id").orderBy("dist_sq", "c_id")
    return (
        scored.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("q_id").alias("src"),
            F.col("c_id").alias("dst"),
            "dist_sq",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
