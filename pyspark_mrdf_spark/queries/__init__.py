"""Query registry.

Every engine operator demonstrated against the driver corpus registers
here as a named query: a DataFrame-API builder plus (when the semantics
are ANSI-SQL-expressible) a DuckDB oracle SQL string. ``__spark_entry__``
exposes this registry to the verify driver.

Column-name contract: the driver compares Spark result vs oracle result
after sorting columns by name — every computed column is aliased
identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, description: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, description=description, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: registration) and return
    the registry."""
    from pyspark_mrdf_spark.queries import (  # noqa: F401
        relational,
        vector,
        dedup,
        text,
        events,
        multimodal,
    )

    return REGISTRY
