"""N-gram language-model quality scoring (the CCNet-style filter).

CCNet (Wenzek et al. 2020) ranks CommonCrawl documents by the
perplexity of a KenLM 5-gram model trained on a clean reference
corpus; the low-perplexity band becomes training data. This module
re-expresses that pipeline Spark-first with a trigram STUPID-BACKOFF
model (Brants et al. 2007 — "Large Language Models in Machine
Translation" showed stupid backoff matches Kneser-Ney at corpus scale
while needing only raw counts, which is exactly what a distributed
trainer wants: three groupBy passes, no discounting state).

No counterpart in the reference repo (emull8r/PySpark-MRDF) — this is
part of the training-data-pipeline extension surface.

Fixed-point discipline: per-token scores are INTEGER ratios —
``(SCALE * numerator) div denominator`` with the 0.4-per-level backoff
penalty premultiplied into SCALE (1e6 / 4e5 / 1.6e5), so a score is a
single integer division of exact counts and the whole scorer is
bit-identical across engines (no logs, no floats; the mean score is an
order-free SUM div COUNT). A doc's ``mean_score_e6`` is the fixed-point
average per-token backoff probability — the monotone inverse of
perplexity for ranking purposes, which is all a band filter uses.

Scale shape at 100 TB:

 * training = three groupBy counts (one shuffle each, keys are
   n-grams) + one equi-join per table to attach the context count —
   the join a production trainer does ONCE so serving never needs a
   second lookup table;
 * ``min_count`` prunes the tails of the bigram/trigram tables (the
   standard KenLM pruning dial) — at corpus scale the unpruned trigram
   table is corpus-sized, pruned it is a vocabulary artifact;
 * scoring = per-doc trigram explode + three LEFT equi-joins against
   the count tables + one per-doc agg. Head n-grams are skewed keys;
   AQE skew-join handles them (the count side of each join is one row
   per n-gram, so no salting is needed — skew is confined to the
   probe side, which AQE splits).

Measured (SCALABILITY.json synthetic-20000-dedup and
synthetic-500000-dedup rows): training AND self-scoring the planted
20k-doc / 49.5M-char corpus takes 14.8 s on local[32]; the 25× corpus
(500k docs / 1.24G chars) takes 237.6 s — 16× cost for 25× tokens,
sublinear end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# premultiplied backoff scales: 1.0, 0.4, 0.4*0.4 of 1e6
_SCALE_TRI = 1_000_000
_SCALE_BI = 400_000
_SCALE_UNI = 160_000

_PAD = "<s>"


def _padded_tokens(df: DataFrame, text_col: str) -> F.Column:
    """Whitespace tokens with two leading sentinel pads, so every real
    token has a full trigram context (standard LM padding; the pads
    are counted in training like any token, mirrored in the oracle)."""
    return F.concat(
        F.array(F.lit(_PAD), F.lit(_PAD)), F.split(F.col(text_col), " ")
    )


def lm_train(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the trigram stupid-backoff model: returns
    ``(tri, bi, uni)`` count tables.

    * ``uni``: (w, c1) token counts over the padded corpus, plus the
      corpus total attached as ``n_total`` on every row (a broadcast
      1-row aggregate — no second pass at serve time).
    * ``bi``: (w1, w2, c2, c1ctx) with the context count c1(w1)
      pre-joined.
    * ``tri``: (w1, w2, w3, c3, c2ctx) with c2(w1, w2) pre-joined.

    ``min_count`` > 1 drops bigram/trigram rows with fewer
    occurrences (the pruning dial; unigrams are never pruned so OOV
    stays well-defined).
    """
    toks = df.select(_padded_tokens(df, text_col).alias("t"))

    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    )
    total = uni.agg(F.sum("c1").cast("bigint").alias("n_total"))
    uni = uni.crossJoin(F.broadcast(total))

    bi = (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i).alias("w1"),
                        F.element_at(F.col("t"), i + 1).alias("w2"),
                    ),
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    )
    if min_count > 1:
        bi = bi.filter(F.col("c2") >= min_count)
    bi = bi.join(
        uni.select(F.col("w").alias("w1"), F.col("c1").alias("c1ctx")), "w1"
    )

    tri = (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i).alias("w1"),
                        F.element_at(F.col("t"), i + 1).alias("w2"),
                        F.element_at(F.col("t"), i + 2).alias("w3"),
                    ),
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2", "g.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c3"))
    )
    if min_count > 1:
        tri = tri.filter(F.col("c3") >= min_count)
    tri = tri.join(
        bi.select("w1", "w2", F.col("c2").alias("c2ctx")), ["w1", "w2"]
    )
    return tri, bi, uni


def lm_score(
    docs: DataFrame,
    tri: DataFrame,
    bi: DataFrame,
    uni: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document stupid-backoff quality scores against a trained
    model: (id, n_tokens, sum_score_e6, mean_score_e6, n_oov).

    Every real token w3 with padded context (w1, w2) scores

      * trigram tier: ``(1e6 * c3(w1 w2 w3)) div c2(w1 w2)`` when the
        trigram was seen,
      * else bigram tier: ``(4e5 * c2(w2 w3)) div c1(w2)``,
      * else unigram tier: ``(1.6e5 * c1(w3)) div N``,
      * else (OOV) 0 — counted in ``n_oov``.

    All integer arithmetic on exact counts; ``mean_score_e6`` is
    ``sum div n_tokens``. Higher = more reference-corpus-like (the
    inverse-perplexity ranking CCNet's band filter consumes).
    """
    # project the token array ONCE before the higher-order transform:
    # subexpression elimination does not reach inside HOF lambdas, so
    # an inline split expression would re-tokenize the document at
    # every element_at — O(n_tok * n_chars) per doc instead of
    # O(n_chars)
    toks = docs.select(
        F.col(id_col), _padded_tokens(docs, text_col).alias("t")
    )
    t = F.col("t")
    grams = toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 2),
                lambda i: F.struct(
                    F.element_at(t, i).alias("w1"),
                    F.element_at(t, i + 1).alias("w2"),
                    F.element_at(t, i + 2).alias("w3"),
                ),
            )
        ).alias("g"),
    ).select(id_col, "g.w1", "g.w2", "g.w3")

    scored = (
        grams.join(tri.select("w1", "w2", "w3", "c3", "c2ctx"), ["w1", "w2", "w3"], "left")
        .join(
            bi.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("c2").alias("bo_c2"),
                F.col("c1ctx").alias("bo_c1ctx"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            uni.select(
                F.col("w").alias("w3"),
                F.col("c1").alias("u_c1"),
                "n_total",
            ),
            ["w3"],
            "left",
        )
        .select(
            F.col(id_col),
            F.when(
                F.col("c3").isNotNull(),
                F.expr(f"({_SCALE_TRI} * c3) div c2ctx"),
            )
            .when(
                F.col("bo_c2").isNotNull(),
                F.expr(f"({_SCALE_BI} * bo_c2) div bo_c1ctx"),
            )
            .when(
                F.col("u_c1").isNotNull(),
                F.expr(f"({_SCALE_UNI} * u_c1) div n_total"),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("sc"),
            F.col("u_c1").isNull().alias("oov"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("sc").cast("bigint").alias("sum_score_e6"),
        F.expr("sum(sc) div count(1)").cast("bigint").alias("mean_score_e6"),
        F.sum(F.col("oov").cast("bigint")).cast("bigint").alias("n_oov"),
    )
