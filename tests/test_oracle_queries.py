"""Every registered query with an oracle must match DuckDB exactly
(the driver's t2 gate, replicated locally at sf0.001)."""

from __future__ import annotations

import pytest

from pyspark_mrdf_spark.queries import load_all
from tests.oracle_util import compare_query

SPECS = load_all()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, name):
    spec = SPECS[name]
    compare_query(spark, sf_dir, name, spec.builder, spec.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0


def test_registry_contract():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 15
