"""Cross-engine-exact scalar helpers.

Money math runs in DECIMAL so sums are association-order independent
(a float sum over a 100 TB shuffle is nondeterministic run-to-run).
The final DOUBLE cast goes through DECIMAL(38,3): with scale 3 the
unscaled value stays below 2^53 for any realistic sum, so the
decimal->double conversion is a single correctly-rounded step in both
Spark (BigDecimal.doubleValue) and DuckDB (int128 divide) — at higher
scales DuckDB double-rounds and drifts 1 ulp from Spark.
"""

from __future__ import annotations

from pyspark.sql import Column


def dec_to_double(c: Column) -> Column:
    """DECIMAL aggregate -> hash-stable DOUBLE (see module docstring)."""
    return c.cast("decimal(38,3)").cast("double")
