"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship market-basket query (frequent event-type
pairs, the reference's GET /analytics/frequent-pairs —
Rest_webservice/app/services.py:16-23) at sf0.001.  ``queries`` /
``oracle_sql`` are generated from the engine's registry
(bigdata_assigment3_spark/registry.py) so every operator has exactly
one source of truth.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_assigment3_spark import oracle_sqls, query_fns  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return query_fns()["frequent_pairs"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query in ``queries()``."""
    return oracle_sqls()
