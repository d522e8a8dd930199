"""Declarative data-quality constraints (the Deequ-shaped audit a
pipeline runs before promoting a dataset).

A constraint list compiles to ONE aggregation pass over the table —
every check becomes a ``sum(case ...)`` / ``count(distinct ...)``
column in a single ``agg``, then the wide row unpivots to the
(constraint, violations, passed) report. At 100 TB this matters: N
constraints cost one scan, not N, and each check is a JVM expression
inside the same whole-stage-codegen span as the scan.

Referential integrity is the one constraint that can't live in the
single-table pass — it compiles to a left-anti join against the
referenced key set (broadcast when the dimension is small, exactly
like any other dim join) and unions into the same report shape.

Checks are exact integers, so a quality report is hash-verifiable
like any other query here — no "profile drifted within tolerance"
fuzz; a gate either holds or names its violation count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class NotNull:
    col: str

    @property
    def name(self) -> str:
        return f"not_null({self.col})"

    def violations(self) -> Column:
        return F.sum(F.when(F.col(self.col).isNull(), 1).otherwise(0))


@dataclass(frozen=True)
class Unique:
    col: str

    @property
    def name(self) -> str:
        return f"unique({self.col})"

    def violations(self) -> Column:
        # rows beyond the first of each key value; NULLs are not keys
        return F.sum(F.when(F.col(self.col).isNotNull(), 1).otherwise(0)) - (
            F.countDistinct(F.col(self.col))
        )


@dataclass(frozen=True)
class InSet:
    col: str
    allowed: tuple

    @property
    def name(self) -> str:
        return f"in_set({self.col})"

    def violations(self) -> Column:
        return F.sum(
            F.when(~F.col(self.col).isin(*self.allowed), 1).otherwise(0)
        )


@dataclass(frozen=True)
class Satisfies:
    """Arbitrary row predicate (SQL text) that must hold on every row;
    NULL predicate results count as violations (unknown ≠ pass)."""

    predicate: str
    label: str

    @property
    def name(self) -> str:
        return f"satisfies({self.label})"

    def violations(self) -> Column:
        return F.sum(
            F.when(F.coalesce(F.expr(self.predicate), F.lit(False)), 0).otherwise(1)
        )


def quality_report(df: DataFrame, checks: list) -> DataFrame:
    """(check_name, violations, passed) — one aggregation pass for the
    whole constraint list. (``check_name``, not ``constraint`` — the
    latter is a reserved word in several SQL dialects and the report
    must be oracle-queryable verbatim.)"""
    aggs = [c.violations().cast("bigint").alias(f"_c{i}") for i, c in enumerate(checks)]
    wide = df.agg(*aggs)
    report = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c.name).alias("check_name"),
                        F.col(f"_c{i}").alias("violations"),
                    )
                    for i, c in enumerate(checks)
                ]
            )
        ).alias("r")
    ).select(
        "r.check_name",
        "r.violations",
        (F.col("r.violations") == 0).alias("passed"),
    )
    return report


def referential_report(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str, label: str
) -> DataFrame:
    """Same report shape for a foreign-key check: rows of ``child``
    whose non-null ``child_col`` has no match in ``parent.parent_col``
    (a left-anti equi-join — broadcast when the parent is a dim)."""
    orphans = (
        child.filter(F.col(child_col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias(child_col)).distinct(),
            child_col,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
    )
    return orphans.select(
        F.lit(f"references({label})").alias("check_name"),
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )
