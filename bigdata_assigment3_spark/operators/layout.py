"""Physical-layout operators: space-filling-curve (Z-order)
clustering for multi-dimensional data skipping.

``partitioned_write_prune`` (coverage) and ``bucketed_colocated_join``
(bucketing) cover 1-D partition pruning and co-located joins; this
module adds the third layout tool a 100 TB table needs: clustering on
a bit-interleaved Z-value so per-file min/max statistics prune scans
on BOTH dimensions of a 2-D predicate (the layout behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``).

The Z-value is a pure projection (quantize each dim to 8 bits against
the domain max, interleave the bits) computed scan-side; at scale the
write is ``repartitionByRange(zval)`` + parquet, and the query below
IS the resulting per-file skipping index: for every Z-run ("file") it
reports the min/max envelope of both dimensions.  The envelopes are
narrow in BOTH dims — a 1-D sort gives span ~= whole domain on the
other dim — which is the entire point, and what the spans in the
result rows demonstrate.

Everything is integer arithmetic (quantize = scaled integer division,
interleave = shift/mask), so the oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..sources import load_table

Z_BITS = 8          # bits per dimension -> 16-bit Z value
FILE_SHIFT = 10     # zval >> 10 -> 64 logical files
_EPOCH = "1992-01-01"  # TPC-H order dates start here


def _interleave_spark(x: str, y: str) -> str:
    """Spark SQL expr: bit-interleave two {Z_BITS}-bit ints (x even
    bits, y odd bits)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


def _interleave_duck(x: str, y: str) -> str:
    """DuckDB SQL expr: same interleave, operator syntax."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "zorder_layout_stats",
    oracle=f"""
    WITH d AS (
      SELECT o_custkey AS ck,
             date_diff('day', DATE '{_EPOCH}', o_orderdate) AS dd
      FROM orders
    ),
    r AS (SELECT MAX(ck) AS mck, MAX(dd) AS mdd FROM d),
    q AS (
      SELECT ck, dd,
             (ck * {1 << Z_BITS}) // (mck + 1) AS xq,
             (dd * {1 << Z_BITS}) // (mdd + 1) AS yq
      FROM d, r
    ),
    z AS (
      SELECT ck, dd, ({_interleave_duck("xq", "yq")}) >> {FILE_SHIFT} AS file_id
      FROM q
    )
    SELECT CAST(file_id AS BIGINT) AS file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(ck) AS BIGINT) AS min_custkey,
           CAST(MAX(ck) AS BIGINT) AS max_custkey,
           CAST(MIN(dd) AS BIGINT) AS min_day,
           CAST(MAX(dd) AS BIGINT) AS max_day,
           CAST(MAX(ck) - MIN(ck) AS BIGINT) AS custkey_span,
           CAST(MAX(dd) - MIN(dd) AS BIGINT) AS day_span
    FROM z GROUP BY file_id
    """,
)
def q_zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering index over orders on (o_custkey,
    o_orderdate): quantize both dims to {Z_BITS} bits, interleave into
    a Z-value, cut the curve into 64 logical files, and report each
    file's row count + min/max envelope of BOTH dimensions.

    The envelope spans are the data-skipping index a lakehouse writes
    per file: a predicate box on (custkey range x date range) only
    touches files whose envelope intersects it — in both dims at once,
    which a single-column sort cannot give.  The Z-value is a
    scan-side projection (no shuffle until the final 64-group agg);
    the production write adds one range shuffle on zval, exactly the
    distributed-sort shape.
    """
    d = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.datediff("o_orderdate", F.lit(_EPOCH)).alias("dd"),
    )
    # domain maxes: 1-row broadcast (same shape as the oracle's r CTE)
    r = d.agg(F.max("ck").alias("mck"), F.max("dd").alias("mdd"))
    q = d.crossJoin(F.broadcast(r)).select(
        "ck",
        "dd",
        F.expr(f"(ck * {1 << Z_BITS}) div (mck + 1)").alias("xq"),
        F.expr(f"(dd * {1 << Z_BITS}) div (mdd + 1)").alias("yq"),
    )
    z = q.select(
        "ck",
        "dd",
        F.expr(f"shiftright({_interleave_spark('xq', 'yq')}, {FILE_SHIFT})").alias("file_id"),
    )
    return z.groupBy(F.col("file_id").cast("bigint").alias("file_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("ck").cast("bigint").alias("min_custkey"),
        F.max("ck").cast("bigint").alias("max_custkey"),
        F.min("dd").cast("bigint").alias("min_day"),
        F.max("dd").cast("bigint").alias("max_day"),
        (F.max("ck") - F.min("ck")).cast("bigint").alias("custkey_span"),
        (F.max("dd") - F.min("dd")).cast("bigint").alias("day_span"),
    )


N_SMALL = 16   # fragmented write
N_COMPACT = 2  # target file count


@query(
    "compact_small_files",
    oracle=f"""
    SELECT CAST({N_SMALL} AS BIGINT) AS n_files_before,
           CAST({N_COMPACT} AS BIGINT) AS n_files_after,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS sum_orderkeys,
           TRUE AS ranges_disjoint
    FROM orders
    """,
)
def q_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the lakehouse maintenance op a
    streaming-ingest table needs nightly: a fragmented {N_SMALL}-file
    write is rewritten as {N_COMPACT} range-sorted files
    (``repartitionByRange`` on the key = the OPTIMIZE pattern), and
    the result row PROVES the contract from the actual output files:
    file counts measured from disk, row count and key checksum
    preserved, and the compacted files' key ranges disjoint (read
    back per file via the _metadata path), which is what makes
    min/max skipping effective after compaction.

    At scale this is the same job with target file size instead of a
    count; the range shuffle is the only cost and it amortizes every
    subsequent scan."""
    import os
    import shutil
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    base = os.path.join(
        tempfile.gettempdir(),
        f"bd3_compact_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(base, ignore_errors=True)
    small, compact = f"{base}/small", f"{base}/compact"
    orders.repartition(N_SMALL).write.parquet(small)
    n_before = len([f for f in os.listdir(small) if f.endswith(".parquet")])
    spark.read.parquet(small).repartitionByRange(
        N_COMPACT, "o_orderkey"
    ).sortWithinPartitions("o_orderkey").write.parquet(compact)
    n_after = len([f for f in os.listdir(compact) if f.endswith(".parquet")])
    back = spark.read.parquet(compact)
    per_file = back.groupBy(F.col("_metadata.file_path").alias("f")).agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    )
    a, b = per_file.alias("a"), per_file.alias("b")
    overlaps = (
        a.join(b, F.col("a.f") < F.col("b.f"))
        .filter(
            (F.col("a.lo") <= F.col("b.hi")) & (F.col("b.lo") <= F.col("a.hi"))
        )
        .count()
    )
    return back.agg(
        F.lit(n_before).cast("bigint").alias("n_files_before"),
        F.lit(n_after).cast("bigint").alias("n_files_after"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("o_orderkey").cast("bigint")).cast("bigint").alias("sum_orderkeys"),
        F.lit(overlaps == 0).alias("ranges_disjoint"),
    )
