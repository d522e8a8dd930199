"""Session-scoped materialized-result registry.

Several registry queries share expensive sub-results: q50/q56/q57 all
need the exact k-NN graph, q51/q57 the IVF graph, q55/q56 the seeded
MRDF graph. Each query is a pure function of (semantic key, input
tables), so within one SparkSession the materialized result can be
built once and re-served — the engine-level analogue of a materialized
view / common-subplan cache, and exactly how a serving deployment
would amortize an index build across queries.

Safety rules:
 - Keys must capture EVERY parameter the result depends on (algorithm,
   sf_dir, k, seed, ...). Callers memoize only deterministic builders.
 - Entries are scoped to the SparkContext via ``applicationId``: a
   DataFrame checkpointed in a stopped session is never served to a
   new one (stale entries from dead sessions are dropped on sight).
 - Results are ``localCheckpoint(eager=True)``-materialized: bounded
   output tables (edge lists, signatures), never raw inputs.
"""

from __future__ import annotations

from collections.abc import Callable
from threading import Lock

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}
_LOCK = Lock()


def memoized_df(
    spark: SparkSession,
    key: tuple,
    builder: Callable[[], DataFrame],
    eager: bool = True,
) -> DataFrame:
    """Return the materialized DataFrame for ``key``, building it with
    ``builder`` (then localCheckpoint-ing) on first use.

    ``eager=False`` defers materialization to the caller's first
    action (one fewer Spark job when the caller acts immediately —
    q56 runs recall right after building the MRDF graph); keep the
    default when the build must finish NOW, e.g. on the background
    thread whose whole point is overlapping the materialization.

    Builders may run concurrently for DIFFERENT keys (q56 overlaps its
    exact side on a thread); per-key a single build wins and later
    callers reuse it."""
    app = spark.sparkContext.applicationId
    full = (app,) + key
    with _LOCK:
        hit = _CACHE.get(full)
    if hit is not None:
        return hit
    df = builder().localCheckpoint(eager=eager)
    with _LOCK:
        # drop entries of dead sessions; keep the first build per key
        for k in [k for k in _CACHE if k[0] != app]:
            del _CACHE[k]
        return _CACHE.setdefault(full, df)
