"""Schema-drift guard for the driver-regenerated testdata.

The driver has shipped ``events.ts`` in three physical parquet forms
across rounds — TIMESTAMP(NANOS) (read as BIGINT under nanosAsLong),
timestamp[us] without timezone (TIMESTAMP_NTZ), and timestamp[us]
with timezone.  Round 3 broke because only the bigint form was
normalized.  This test writes all three forms and asserts
``load_table`` / ``_stream_events`` always yield a plain TIMESTAMP
``ts`` with identical instants, so the next encoding change fails
loudly in exactly one place.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from bigdata_assigment3_spark.sources import load_table
from bigdata_assigment3_spark.streaming.queries import _stream_events

from tests.conftest import SF_SMOKE

_INSTANTS_US = [1_700_000_000_000_000, 1_700_000_123_456_789]  # epoch µs


def _write_events(tmpdir: str, ts_type: pa.DataType) -> str:
    ts = pa.array(_INSTANTS_US, type=pa.timestamp("us")).cast(ts_type)
    table = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 11], type=pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.0, 2.0], type=pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, f"{tmpdir}/events.parquet")
    return str(tmpdir)


@pytest.mark.parametrize(
    "ts_type",
    [
        pytest.param(pa.timestamp("ns"), id="nanos-bigint"),
        pytest.param(pa.timestamp("us"), id="ntz"),
        pytest.param(pa.timestamp("us", tz="UTC"), id="utc-tz"),
    ],
)
def test_events_ts_normalized_across_physical_forms(spark, tmp_path, ts_type):
    sf_dir = _write_events(str(tmp_path), ts_type)
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), df.dtypes
    got = sorted(r.us for r in df.selectExpr("unix_micros(ts) AS us").collect())
    assert got == _INSTANTS_US


@pytest.mark.parametrize(
    "ts_type",
    [
        pytest.param(pa.timestamp("ns"), id="nanos-bigint"),
        pytest.param(pa.timestamp("us"), id="ntz"),
        pytest.param(pa.timestamp("us", tz="UTC"), id="utc-tz"),
    ],
)
def test_stream_events_ts_watermarkable(spark, tmp_path, ts_type):
    sf_dir = _write_events(str(tmp_path), ts_type)
    stream = _stream_events(spark, sf_dir)
    assert isinstance(stream.schema["ts"].dataType, T.TimestampType), stream.dtypes
    # withWatermark is the call that rejected NTZ in round 3.
    stream.withWatermark("ts", "1 day")


def test_driver_testdata_events_ts_is_timestamp(spark):
    """The actual driver testdata, whatever encoding it shipped with."""
    df = load_table(spark, SF_SMOKE, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), df.dtypes


def test_batch_and_stream_schemas_agree(spark):
    batch = load_table(spark, SF_SMOKE, "events")
    stream = _stream_events(spark, SF_SMOKE)
    assert [(f.name, f.dataType) for f in batch.schema.fields] == [
        (f.name, f.dataType) for f in stream.schema.fields
    ]


def test_custom_source_plans_partitions(spark):
    """The synthtx custom DataSource must plan a parallel scan (8
    InputPartitions), not a single generator task."""
    from bigdata_assigment3_spark.sources.custom import register_synthtx

    register_synthtx(spark)
    df = spark.read.format("synthtx").load()
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 100_000
