"""Join-strategy hints with an explicit scale contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bounded_broadcast(df: DataFrame, reason: str) -> DataFrame:
    """``F.broadcast`` with a REVIEWED size contract.

    The discipline gate (tests/test_discipline.py) forbids broadcasting
    anything whose row count grows with the corpus: at 100 TB a per-doc
    or per-customer side is billions of rows, and a forced broadcast
    OOMs every executor.  The legitimate exceptions are sides bounded
    by CONSTRUCTION — a literal-id probe set, an enum-keyed dimension,
    a change-rate-sized SCD history in a stream-static join — where the
    bound is a data contract Catalyst cannot see from the plan.  Each
    call site must state that bound in ``reason``, and the gate pins
    the waiver list: adding a site is a reviewed change, not a drive-by
    hint.
    """
    if not reason:
        raise ValueError("bounded_broadcast requires a stated size bound")
    return F.broadcast(df)
