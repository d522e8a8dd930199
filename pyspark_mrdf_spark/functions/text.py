"""Text-analysis column expressions (all JVM-side built-ins — these run
inside whole-stage codegen, no Python in the hot path).

Capabilities (north-star text analysis over ``documents``):
 - tokenization (whitespace + BPE-ish regex splitting)
 - token / distinct-token counting
 - quality scoring (length, stopword ratio, type-token ratio)
 - language-ID n-gram/stopword heuristic
 - document fingerprinting (md5 content hash — portable across
   engines, used for exact dedup and as a shingle hash for MinHash)

Every expression here has an exact DuckDB-SQL equivalent so the whole
family is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword sets for the tiny language-ID heuristic. Deterministic and
# mirrored literally in oracle SQL — keep them short.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def bpe_ish_tokens(col: str | Column = "text") -> Column:
    """BPE-ish sub-word split: alternating letter/digit boundaries and
    punctuation become token breaks (regex, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.regexp_replace(c, r"([0-9]+|[^a-zA-Z0-9 ]+)", r" $1 "), r"\s+")


def n_tokens(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


def n_distinct_tokens(col: str | Column = "text") -> Column:
    return F.size(F.array_distinct(tokens(col)))


def stopword_hits(col: str | Column = "text", stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Number of tokens that are stopwords (array intersection-free:
    per-token membership via filter, counts duplicates)."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def fingerprint(col: str | Column = "text") -> Column:
    """Deterministic 128-bit content fingerprint (md5 hex).

    Portable across engines (DuckDB md5 produces identical hex), unlike
    Spark's xxhash64/hash. The reference had no fingerprinting; this is
    the exact-dedup/LSH building block (north star)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def shingles(col: str | Column = "text", n: int = 3) -> Column:
    """Word n-gram shingle set (distinct), as an array of
    space-joined strings: the MinHash/Jaccard unit."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )
    # guard: Spark's sequence(0, negative) counts DOWN — short texts
    # must yield an empty shingle set, not garbage
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
