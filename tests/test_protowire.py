"""Unit tests for the hand-rolled protobuf wire codec
(functions/protowire.py).  The distributed query
(`protobuf_stream_ingest`) is value-oracled in tests/test_oracle.py."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from bigdata_assigment3_spark.functions.protowire import (
    _varint,
    decode_doc,
    decode_stream,
    encode_doc,
    encode_stream,
    fixed64_field,
)


def test_roundtrip_edge_values():
    docs = [
        (0, ""),
        (-1, "negative int64 is a 10-byte varint"),
        (2**63 - 1, "max"),
        (-(2**63), "min"),
        (127, "1-byte boundary"),
        (128, "2-byte boundary"),
    ]
    assert decode_stream(encode_stream(docs)) == docs


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-(2**63), 2**63 - 1), st.text(max_size=30)),
        max_size=20,
    )
)
def test_roundtrip_property(docs):
    assert decode_stream(encode_stream(docs)) == docs


def test_unknown_fields_are_skipped():
    """The spec's forward-compat contract: a reader must skip fields
    it does not know, by wire type."""
    msg = (
        fixed64_field(9, 123)  # unknown fixed64 BEFORE known fields
        + encode_doc(7, "hi")
        + fixed64_field(3, 456)  # and after
        + b"\x28" + _varint(99)  # unknown varint field 5
        + b"\x32" + _varint(3) + b"abc"  # unknown length-delimited field 6
    )
    assert decode_doc(msg) == (7, "hi")


def test_malformed_rejection():
    good = encode_doc(1, "x")
    with pytest.raises(ValueError, match="truncated varint"):
        decode_doc(good + b"\x80")  # dangling continuation bit in next tag
    with pytest.raises(ValueError, match="missing required"):
        decode_doc(b"")
    with pytest.raises(ValueError, match="overruns"):
        decode_stream(_varint(100) + good)  # length prefix beyond stream
    with pytest.raises(ValueError, match="wire type"):
        decode_doc(b"\x1b")  # field 3, wire type 3 (deprecated groups)


def test_negative_length_field_rejected_not_hung():
    """Review finding: a negative length-delimited length moved pos
    backward and looped forever; must raise instead."""
    msg = b"\x12" + _varint(-11)  # field 2, wire type 2, length -11
    with pytest.raises(ValueError, match="overruns"):
        decode_doc(msg)
    unknown = b"\x32" + _varint(-11)  # unknown field 6, same wire type
    with pytest.raises(ValueError, match="overruns"):
        decode_doc(encode_doc(1, "x") + unknown)


def test_varint_truncates_to_64_bits():
    """A 10-byte varint with high bits set must truncate to int64 like
    conformant readers, not return a >64-bit integer."""
    from bigdata_assigment3_spark.functions.protowire import _read_varint

    overlong = b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x3f"  # ~2^70-1
    v, _ = _read_varint(overlong, 0)
    assert -(2**63) <= v < 2**63
