"""Parquet table loaders for the driver-provided testdata.

Scale notes: ``spark.read.parquet`` gives Catalyst full pushdown
(filters reach row-group stats, unused columns are never read), and
partition sizing is governed by ``spark.sql.files.maxPartitionBytes``
— on a 1000-executor cluster the same code splits 100 TB into
input-sized tasks with no changes here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import ensure_session_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing physical quirks.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark reads it
    (under ``nanosAsLong``) as a long which we convert to a proper
    microsecond TimestampType so downstream window/date logic is plain
    Spark SQL.
    """
    ensure_session_conf(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Integer division: `/` on BIGINT is DOUBLE and epoch-nanos exceed
        # 2^53, so float rounding could shift boundary events by ±1µs.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views (used by SQL-form queries)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
