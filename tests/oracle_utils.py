"""Spark-vs-DuckDB result comparison, mirroring the driver's t2 gate
(row count + schema + order-insensitive value comparison)."""

from __future__ import annotations

import datetime
import decimal
import math


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 3.0 == 3
        return repr(v)
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return _canon(f)
    if isinstance(v, (bool,)):
        return str(int(v))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def normalize(df_pandas) -> list[tuple]:
    """Canonical sorted row-tuples with columns sorted by name."""
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_canon(row[c]) for c in cols)
        for _, row in df_pandas[cols].iterrows()
    ]
    return sorted(rows)


def compare(spark_df, duck_rel, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    sp = spark_df.toPandas()
    dk = duck_rel.df()
    problems = []
    if sorted(sp.columns) != sorted(dk.columns):
        problems.append(f"{name}: schema mismatch spark={sorted(sp.columns)} duck={sorted(dk.columns)}")
        return problems
    # dtype-kind parity: the driver's value-hash may be type-sensitive
    # (int64 '22' vs float64 '22.0'), so don't let _canon paper over it.
    for c in sp.columns:
        ks, kd = sp[c].dtype.kind, dk[c].dtype.kind
        if ks != kd and not sp[c].isna().any() and not dk[c].isna().any():
            problems.append(f"{name}: dtype kind mismatch col={c} spark={sp[c].dtype} duck={dk[c].dtype}")
    if len(sp) != len(dk):
        problems.append(f"{name}: row count spark={len(sp)} duck={len(dk)}")
    a, b = normalize(sp), normalize(dk)
    if a != b:
        sa, sb = set(a), set(b)
        only_spark = list(sa - sb)[:5]
        only_duck = list(sb - sa)[:5]
        problems.append(
            f"{name}: value mismatch; spark-only={only_spark} duck-only={only_duck}"
        )
    return problems
