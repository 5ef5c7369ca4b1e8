"""Integrity tests for tests/make_scale_fixture.py — the sf1-audit
tree is only as trustworthy as its construction, so prove the scaled
universe preserves exactly what it claims: row counts scale, copy 0 is
the original bit-for-bit, referential integrity holds across every FK,
and each key-offset copy is an isomorphic universe (identical join
fan-outs and aggregates)."""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

SRC = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"
COPIES = 3


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scalefix"))
    subprocess.run(
        [sys.executable, "tests/make_scale_fixture.py", str(COPIES), SRC, dst],
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW s_{t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')")
        con.sql(f"CREATE VIEW d_{t} AS SELECT * FROM read_parquet('{dst}/{t}.parquet')")
    yield con
    con.close()


def test_row_counts_scale(scaled):
    for t, dim in [("customer", False), ("orders", False), ("lineitem", False),
                   ("events", False), ("documents", False), ("embeddings", False),
                   ("region", True), ("nation", True)]:
        n_src = scaled.sql(f"SELECT COUNT(*) FROM s_{t}").fetchone()[0]
        n_dst = scaled.sql(f"SELECT COUNT(*) FROM d_{t}").fetchone()[0]
        assert n_dst == (n_src if dim else n_src * COPIES), t


def test_copy_zero_is_the_original(scaled):
    """Rows whose keys are in the original key range must be the
    original rows exactly (EXCEPT-based set equality)."""
    hi = scaled.sql("SELECT MAX(o_orderkey) FROM s_orders").fetchone()[0]
    diff = scaled.sql(
        f"(SELECT * FROM d_orders WHERE o_orderkey <= {hi} EXCEPT SELECT * FROM s_orders)"
        f" UNION ALL "
        f"(SELECT * FROM s_orders EXCEPT SELECT * FROM d_orders WHERE o_orderkey <= {hi})"
    ).fetchone()
    assert diff is None


def test_referential_integrity_holds(scaled):
    for fk, child, parent, pk in [
        ("o_custkey", "d_orders", "d_customer", "c_custkey"),
        ("l_orderkey", "d_lineitem", "d_orders", "o_orderkey"),
        ("l_partkey", "d_lineitem", "d_part", "p_partkey"),
        ("l_suppkey", "d_lineitem", "d_supplier", "s_suppkey"),
        # events.user_id joins customer.c_custkey (streaming PIT
        # enrich), so the scaled universes must keep it resolvable
        ("user_id", "d_events", "d_customer", "c_custkey"),
    ]:
        orphans = scaled.sql(
            f"SELECT COUNT(*) FROM {child} c LEFT JOIN {parent} p"
            f" ON c.{fk} = p.{pk} WHERE p.{pk} IS NULL"
        ).fetchone()[0]
        assert orphans == 0, (child, fk)


def test_copies_are_isomorphic_universes(scaled):
    """Every copy must reproduce the source's join fan-out exactly:
    the (order -> lineitem count, revenue) distribution per universe
    equals the source distribution."""
    stride = scaled.sql("SELECT MAX(o_orderkey) + 1 FROM s_orders").fetchone()[0]
    src_sig = scaled.sql(
        "SELECT COUNT(*), SUM(n), ROUND(SUM(rev), 2) FROM ("
        " SELECT o_orderkey, COUNT(*) AS n, SUM(l_extendedprice) AS rev"
        " FROM s_lineitem JOIN s_orders ON l_orderkey = o_orderkey GROUP BY 1)"
    ).fetchone()
    for i in range(COPIES):
        copy_sig = scaled.sql(
            f"SELECT COUNT(*), SUM(n), ROUND(SUM(rev), 2) FROM ("
            f" SELECT o_orderkey, COUNT(*) AS n, SUM(l_extendedprice) AS rev"
            f" FROM d_lineitem JOIN d_orders ON l_orderkey = o_orderkey"
            f" WHERE o_orderkey >= {i * stride} AND o_orderkey < {(i + 1) * stride}"
            f" GROUP BY 1)"
        ).fetchone()
        assert copy_sig == src_sig, (i, copy_sig, src_sig)


def test_non_key_columns_untouched(scaled):
    """Timestamps and payload columns replicate bit-for-bat: the
    distinct value sets must be identical between source and scaled."""
    for col, s_t, d_t in [
        ("o_orderdate", "s_orders", "d_orders"),
        ("l_shipdate", "s_lineitem", "d_lineitem"),
        ("event_type", "s_events", "d_events"),
    ]:
        extra = scaled.sql(
            f"SELECT COUNT(*) FROM (SELECT DISTINCT {col} FROM {d_t}"
            f" EXCEPT SELECT DISTINCT {col} FROM {s_t})"
        ).fetchone()[0]
        assert extra == 0, col
