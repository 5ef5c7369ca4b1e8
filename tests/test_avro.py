"""Unit tests for the hand-rolled Avro OCF writer/reader
(functions/avro.py): round trips incl. varint edge values, spec-level
validation, and malformed-input rejection.  The distributed query
(`avro_ocf_ingest`) is value-oracled in tests/test_oracle.py."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from bigdata_assigment3_spark.functions.avro import avro_ocf_bytes, read_avro_ocf

FIELDS = [("doc_id", "long"), ("text", "string")]
SYNC = b"\xabSYNCSYNCSYNCSY\xcd"


def test_roundtrip_basic_and_edge_longs():
    recs = [
        {"doc_id": 0, "text": ""},
        {"doc_id": -1, "text": "a"},
        {"doc_id": 2**62, "text": "unicode: émoji ✓"},
        {"doc_id": -(2**62), "text": "x" * 1000},
        {"doc_id": 63, "text": "varint boundary"},
        {"doc_id": 64, "text": "varint boundary+1"},
    ]
    fields, back = read_avro_ocf(avro_ocf_bytes(recs, FIELDS, SYNC))
    assert fields == FIELDS and back == recs


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-(2**63), 2**63 - 1), st.text(max_size=40)),
        max_size=30,
    )
)
def test_roundtrip_property(pairs):
    recs = [{"doc_id": d, "text": t} for d, t in pairs]
    _, back = read_avro_ocf(avro_ocf_bytes(recs, FIELDS, SYNC))
    assert back == recs


def test_layout_is_spec_exact():
    blob = avro_ocf_bytes([{"doc_id": 1, "text": "t"}], FIELDS, SYNC)
    assert blob[:4] == b"Obj\x01"
    assert blob.endswith(SYNC)
    assert b"avro.schema" in blob and b'"type": "record"' in blob
    assert b"avro.codec" in blob and b"null" in blob


def test_writer_rejects_bad_input():
    with pytest.raises(ValueError, match="sync"):
        avro_ocf_bytes([], FIELDS, b"short")
    with pytest.raises(ValueError, match="unsupported field type"):
        avro_ocf_bytes([{"x": 1.5}], [("x", "double")], SYNC)


def test_reader_rejects_malformed():
    good = avro_ocf_bytes([{"doc_id": 5, "text": "hi"}], FIELDS, SYNC)
    with pytest.raises(ValueError, match="magic"):
        read_avro_ocf(b"PK\x03\x04" + good[4:])
    corrupt = bytearray(good)
    corrupt[-1] ^= 0xFF  # break the trailing sync marker
    with pytest.raises(ValueError, match="sync marker"):
        read_avro_ocf(bytes(corrupt))
    deflated = good.replace(b"null", b"zstd", 1)
    with pytest.raises(ValueError, match="codec"):
        read_avro_ocf(deflated)


def test_adversarial_lengths_rejected_not_hung():
    """Review finding: negative metadata key/value lengths oscillated
    pos and spun ~2^63 iterations; must raise promptly."""
    from bigdata_assigment3_spark.functions.avro import _zigzag_encode

    with pytest.raises(ValueError, match="count exceeds|key overruns|truncated"):
        read_avro_ocf(b"Obj\x01" + _zigzag_encode(2**40) + b"\x01" * 4)
    good = avro_ocf_bytes([{"doc_id": 5, "text": "hi"}], FIELDS, SYNC)
    # corrupt the in-block string length to a negative zigzag value
    body_at = good.index(b"hi")
    corrupt = bytearray(good)
    corrupt[body_at - 1] = 0x01  # zigzag(-1)
    with pytest.raises(ValueError):
        read_avro_ocf(bytes(corrupt))
