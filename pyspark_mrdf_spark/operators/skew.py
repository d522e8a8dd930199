"""Skew mitigation primitives (SURVEY.md §4.1 "skew handling").

MRDF's α-division bounds vector groups algorithmically and AQE's
skew-join splitting is on by default (session.py), but a pipeline at
100 TB still meets hot keys in plain equi-joins (one user with 10⁸
events, one document duplicated everywhere). ``salted_join`` is the
classic fix: spray the skewed side across ``n_salts`` sub-keys and
replicate the small side to match — the hot key's rows land on
n_salts reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``key`` with the skewed side
    salted into ``n_salts`` shuffle sub-keys.

    ``other`` is replicated n_salts× (explode of a literal range — no
    extra scan), so it should be the smaller side; the result equals
    the plain join exactly, row multiplicity included."""
    salt = (F.rand(seed) * n_salts).cast("int")
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return left.join(right, [key, "_salt"], how).drop("_salt")
