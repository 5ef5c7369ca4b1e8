"""t2 mirror: every oracle-declared query must match DuckDB exactly at
the oracle scale factor (driver uses sf0.01)."""

from __future__ import annotations

import pytest

from bigdata_assigment3_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare

_load_all()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_ORACLE)
    problems = compare(sdf, duck.sql(spec.oracle), name)
    assert not problems, "\n".join(problems)
    # an empty result matches an empty oracle trivially — require rows
    # so a dead predicate can't silently pass the gate
    assert sdf.limit(1).count() == 1, f"{name}: 0 rows at oracle SF"


def test_no_rows_only_queries():
    """Round 12 closed the last oracle gaps (EM loops, deterministic
    k-means/LSH/IVF/PQ): every registered query must carry a DuckDB
    value oracle — a regression here means a new query shipped without
    one, which the driver would record as a weaker rows-only check."""
    assert ROWS_ONLY_QUERIES == [], ROWS_ONLY_QUERIES


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_alignment():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(REGISTRY)


def test_driver_window_fully_oracle_backed():
    """The driver's correctness gate samples the FIRST 50 entries of
    queries(); every one of them must carry a value oracle — a
    rows-only query drifting into the window silently weakens the
    gate."""
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    window = list(qs)[:50]
    missing = [n for n in window if n not in os_]
    assert not missing, f"rows-only queries inside the driver window: {missing}"
