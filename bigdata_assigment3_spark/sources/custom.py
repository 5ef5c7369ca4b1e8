"""Custom Python DataSource (PySpark 4 DataSource API): a
deterministic synthetic transaction source with real partition
planning.

This exercises the S-category from the SOURCE side of the API: where
the other sources adapt files the driver hands us, this one IS a
source implementation — ``partitions()`` plans N independent splits
(the scan parallelizes without any input files), ``read(partition)``
generates rows per split, and the whole thing registers under a
format name like any built-in (``spark.read.format("synthtx")``).

Rows are pure integer arithmetic on the row id, so a DuckDB oracle
reproduces the exact relation from ``range()`` — the custom source is
value-checked end to end, not just smoke-tested.

At scale this pattern is how Spark ingests from systems without a
native connector (internal APIs, bespoke storage): one InputPartition
per remote shard, arrow-batched rows out.

The classes are defined INSIDE the registration function: Spark
pickles the DataSource class to Python workers, and a module-level
class would pickle by reference to this package, which workers don't
have on sys.path under a bare driver session.  Function-local classes
cloudpickle by value — fully self-contained (same contract as the
repo's pandas-UDF closures).
"""

from __future__ import annotations

SYNTH_ROWS = 100_000
SYNTH_PARTS = 8

# Row derivation (shared text so the DuckDB oracle states the same math):
#   user_id = id % 97
#   kind    = ('a','b','c','d')[id % 4]
#   amount  = (id * 31) % 1000
SYNTH_SCHEMA = "tx_id BIGINT, user_id BIGINT, kind STRING, amount BIGINT"


def register_synthtx(spark) -> None:
    """Idempotent 'synthtx' format registration (re-register is harmless)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    default_rows, default_parts, schema_str = SYNTH_ROWS, SYNTH_PARTS, SYNTH_SCHEMA

    class _RangePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class SyntheticTxReader(DataSourceReader):
        def __init__(self, options):
            self.n_rows = int(options.get("rows", default_rows))
            self.n_parts = int(options.get("partitions", default_parts))

        def partitions(self):
            step = -(-self.n_rows // self.n_parts)  # ceil div
            return [
                _RangePartition(lo, min(lo + step, self.n_rows))
                for lo in range(0, self.n_rows, step)
            ]

        def read(self, partition):
            kinds = ("a", "b", "c", "d")
            for i in range(partition.start, partition.end):
                yield (i, i % 97, kinds[i % 4], (i * 31) % 1000)

    class SyntheticTxDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthtx"

        def schema(self):
            return schema_str

        def reader(self, schema):
            return SyntheticTxReader(self.options)

    spark.dataSource.register(SyntheticTxDataSource)
