"""Cross-engine deterministic hashing.

Both engines share md5; the numeric form is the first 14 hex chars
(56 bits, safely inside BIGINT).  Spark parses hex via CONV, DuckDB
via the '0x' string-literal cast — same integer either way, verified
in tests.  Built-in hash()/xxhash64 are NOT portable across engines.
"""

from __future__ import annotations


def md5_int56_spark(expr: str) -> str:
    """Spark SQL expression: 56-bit integer hash of ``expr``."""
    return f"CAST(CONV(SUBSTRING(MD5({expr}), 1, 14), 16, 10) AS BIGINT)"


def md5_int56_duck(expr: str) -> str:
    """DuckDB SQL expression: same 56-bit integer hash."""
    return f"(('0x' || substr(md5({expr}), 1, 14))::BIGINT)"
