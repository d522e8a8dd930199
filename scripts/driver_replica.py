"""Replica of the verify driver: import __spark_entry__ from a clean
process, smoke-run entry(), then run every queries() entry at sf0.01
against its oracle_sql() via DuckDB with the driver's STRICT
comparison semantics.

Round-1 taught us the driver is stricter than a tuple compare:

 * it canonicalizes via pandas ``sort_values`` — raw array/list cells
   crash it (``TypeError: unhashable type: 'numpy.ndarray'``), so every
   query must emit scalar cells only (q40/q42/q68 regressed this way);
 * its value hash is dtype-sensitive — DuckDB HUGEINT (bare ``SUM``)
   arrives as a different dtype than Spark's int64 and hash-fails even
   when values are equal (q33/q58), so oracles must CAST sums.

This replica reproduces both failure classes. The Spark session is a
plain one — NOT our tuned builder — because the driver's session is
not ours either; any conf the engine needs must be applied at
query-build time (``session.apply_engine_conf`` via ``load_table``).

Usage: python scripts/driver_replica.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from tests.oracle_util import duck_con


def canon(pdf: pd.DataFrame, label: str) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, rows sorted
    by all columns; rejects array-typed cells the way the driver's
    canonicalizer crashes on them."""
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        for v in pdf[c].head(50):
            if isinstance(v, (list, tuple, np.ndarray, dict)):
                raise TypeError(
                    f"{label}: column {c!r} holds {type(v).__name__} cells — "
                    "driver canonicalizer would crash; serialize to scalar"
                )
        # datetime unit (ns vs us) is a collection-path artifact the real
        # driver tolerates (q12/q15 were hash-green in round 1); int-vs-
        # float drift is NOT tolerated (q33/q58 round-1 evidence), so only
        # datetimes are normalized here.
        if pdf[c].dtype.kind == "M":
            pdf[c] = pdf[c].astype("datetime64[ns]")
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)


def value_hash(pdf: pd.DataFrame) -> int:
    """Dtype-sensitive value hash (as the driver's is)."""
    if len(pdf) == 0:
        return 0
    return int(pd.util.hash_pandas_object(pdf, index=False).sum())


def diagnose(s: pd.DataFrame, d: pd.DataFrame) -> str:
    dt_s = {c: str(s[c].dtype) for c in s.columns}
    dt_d = {c: str(d[c].dtype) for c in d.columns}
    diff = {c: (dt_s[c], dt_d.get(c)) for c in dt_s if dt_s[c] != dt_d.get(c)}
    if diff:
        return f"dtype-diff={diff}"
    neq = (s.astype(str) != d.astype(str)).any(axis=1)
    if neq.any():
        i = int(np.argmax(neq.to_numpy()))
        return f"first-row-diff idx={i}: {s.iloc[i].to_dict()} vs {d.iloc[i].to_dict()}"
    return "values equal as str — raw hash artifact"


def main(
    sf_dir: str,
    only: list[str],
    include_all: bool = False,
    execute_only: bool = False,
) -> int:
    # A plain session, as the driver would make it — NOT our tuned builder.
    builder = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("driver-replica")
        .config("spark.sql.shuffle.partitions", "32")
    )
    if execute_only:
        # the sf0.1 scale smoke is OUR gate, not a driver replay: give it
        # the same heap the bench/test sessions get (the driver's plain
        # 1g default OOMs legitimate sf0.1 sort spills, e.g. q138's
        # co-order self-join — an artifact of the tiny heap, not the plan)
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        )
    spark = builder.getOrCreate()

    t0 = time.time()
    df = entry_mod.entry(spark)
    rows = df.collect()
    print(f"[entry] rows={len(rows)} cols={df.columns} in {time.time()-t0:.1f}s")
    assert len(df.columns) > 0

    from pyspark_mrdf_spark.queries import resolve_oracle

    if include_all:
        from pyspark_mrdf_spark.queries import load_all

        specs = load_all()
        qs = {n: s.builder for n, s in specs.items()}
        # execute-only never consults an oracle; data-dependent oracles
        # (q57 trains IVF centroids) would be pure wasted work to resolve
        oracles = (
            {}
            if execute_only
            else {
                n: resolve_oracle(s.oracle, sf_dir)
                for n, s in specs.items()
                if s.oracle
            }
        )
        print(f"[registry] {len(qs)} queries incl. pytest-only, {len(oracles)} with oracle")
    else:
        qs = entry_mod.queries()
        if execute_only:
            oracles = {}
        elif sf_dir.rstrip("/") == "/root/testdata/sf0.01":
            # the driver's own interface, end to end (oracle_sql()
            # resolves data-dependent oracles at sf0.01 by contract)
            oracles = entry_mod.oracle_sql()
        else:
            # another scale: resolve from the registry against ITS
            # data — calling oracle_sql() here would (uselessly, and
            # fatally if sf0.01 is absent) train q57's centroids on
            # sf0.01 first
            from pyspark_mrdf_spark.queries import driver_registry

            oracles = {
                n: resolve_oracle(s.oracle, sf_dir)
                for n, s in driver_registry().items()
                if s.oracle is not None
            }
        print(f"[registry] {len(qs)} driver-facing queries, {len(oracles)} with oracle")

    con = duck_con(sf_dir)
    failed = []
    unknown = [n for n in only if n not in qs]
    if unknown:
        raise SystemExit(f"error: unknown query names {unknown} (registry has {len(qs)})")
    # registration order — the same order the driver walks (and dies) in
    names = [n for n in qs if not only or n in only]
    if not names:
        raise SystemExit("error: query filter matched nothing")
    for name in names:
        t0 = time.time()
        if execute_only:
            # scale smoke mode (--execute-only): run the builder to FULL
            # completion through a noop sink — no oracle, no toPandas —
            # so scale-dependent execution failures (the q136 int32
            # overflow fired only at sf0.1's n_docs) can't hide behind
            # the sf0.01 correctness gate.
            try:
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                print(f"[exec-ok] {name}: in {time.time()-t0:.1f}s")
            except Exception as exc:  # noqa: BLE001
                failed.append((name, f"spark error: {exc}"))
                print(f"[FAIL] {name}: spark error: {exc}")
            continue
        try:
            s = canon(qs[name](spark, sf_dir).toPandas(), name + "/spark")
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"spark error: {exc}"))
            print(f"[FAIL] {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: rows={len(s)} in {time.time()-t0:.1f}s")
            continue
        try:
            d = canon(con.execute(oracles[name]).fetchdf(), name + "/oracle")
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"oracle error: {exc}"))
            print(f"[FAIL] {name}: oracle error: {exc}")
            continue
        if len(s) != len(d):
            status = f"ROWCOUNT {len(s)} vs {len(d)}"
        elif list(s.columns) != list(d.columns):
            status = f"SCHEMA {list(s.columns)} vs {list(d.columns)}"
        elif value_hash(s) != value_hash(d):
            status = f"HASH {diagnose(s, d)}"
        else:
            status = "OK"
        tag = "ok" if status == "OK" else "FAIL"
        print(f"[{tag}] {name}: rows={len(s)} in {time.time()-t0:.1f}s {'' if status=='OK' else status}")
        if status != "OK":
            failed.append((name, status))
    con.close()
    print(f"\n{'ALL GREEN' if not failed else 'FAILURES:'} {failed if failed else ''}")
    return 1 if failed else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    include_all = "--all" in argv
    execute_only = "--execute-only" in argv
    argv = [a for a in argv if a not in ("--all", "--execute-only")]
    # a path-looking arg MUST be a real directory — a typo'd sf_dir must
    # not silently become a never-matching query filter (vacuous green)
    paths = [a for a in argv if os.sep in a]
    for p in paths:
        if not os.path.isdir(p):
            sys.exit(f"error: {p!r} is not a directory")
    if len(paths) > 1:
        sys.exit(f"error: multiple sf dirs given: {paths}")
    sf = paths[0] if paths else "/root/testdata/sf0.01"
    only = [a for a in argv if os.sep not in a]
    sys.exit(main(sf, only, include_all, execute_only))
