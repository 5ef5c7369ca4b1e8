"""Hand-rolled protobuf wire-format codec for a flat record message.

google.protobuf is absent from this sandbox (probed every round), but
the protobuf WIRE format is a tiny published spec (varints +
tag/wire-type framing): this module encodes/decodes a
``message Doc {{ int64 doc_id = 1; string text = 2; }}`` stream in the
standard length-delimited framing (varint message length + body), and
the decoder implements the spec's forward-compatibility contract —
unknown fields are SKIPPED by wire type (varint / 64-bit /
length-delimited / 32-bit), exactly what lets old readers consume new
producers.  int64 negatives use the spec's 10-byte two's-complement
varint (not zigzag — that is sint64's encoding).
"""

from __future__ import annotations

import struct


def _varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # int64 two's complement
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            acc &= (1 << 64) - 1  # conformant readers truncate to 64 bits
            if acc >= 1 << 63:
                acc -= 1 << 64  # int64 two's complement
            return acc, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint exceeds 10 bytes")


def encode_doc(doc_id: int, text: str) -> bytes:
    """One Doc message body (no length prefix)."""
    body = b"\x08" + _varint(doc_id)  # field 1, wire type 0
    raw = text.encode("utf-8")
    body += b"\x12" + _varint(len(raw)) + raw  # field 2, wire type 2
    return body


def encode_stream(docs: list[tuple[int, str]]) -> bytes:
    """Standard length-delimited stream: varint(len) + message, repeated."""
    out = bytearray()
    for doc_id, text in docs:
        msg = encode_doc(doc_id, text)
        out += _varint(len(msg)) + msg
    return bytes(out)


def _skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:  # varint
        _, pos = _read_varint(buf, pos)
        return pos
    if wire_type == 1:  # 64-bit
        return pos + 8
    if wire_type == 2:  # length-delimited
        n, pos = _read_varint(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("length-delimited field overruns message")
        return pos + n
    if wire_type == 5:  # 32-bit
        return pos + 4
    raise ValueError(f"unsupported wire type {wire_type}")


def decode_doc(msg: bytes) -> tuple[int, str]:
    """Parse one Doc body, skipping unknown fields per the spec."""
    pos = 0
    doc_id, text = None, None
    while pos < len(msg):
        tag, pos = _read_varint(msg, pos)
        field, wire_type = tag >> 3, tag & 7
        if field == 1 and wire_type == 0:
            doc_id, pos = _read_varint(msg, pos)
        elif field == 2 and wire_type == 2:
            n, pos = _read_varint(msg, pos)
            if n < 0 or pos + n > len(msg):
                raise ValueError("string field overruns message")
            text = msg[pos : pos + n].decode("utf-8")
            pos += n
        else:
            pos = _skip_field(msg, pos, wire_type)
        if pos > len(msg):
            raise ValueError("field overruns message")
    if doc_id is None or text is None:
        raise ValueError("missing required fields (doc_id, text)")
    return doc_id, text


def decode_stream(blob: bytes) -> list[tuple[int, str]]:
    pos, out = 0, []
    while pos < len(blob):
        n, pos = _read_varint(blob, pos)
        if n < 0 or pos + n > len(blob):
            raise ValueError("message length overruns stream")
        out.append(decode_doc(blob[pos : pos + n]))
        pos += n
    return out


def fixed64_field(field: int, value: int) -> bytes:
    """An unknown-to-Doc fixed64 field, for forward-compat tests."""
    return _varint((field << 3) | 1) + struct.pack("<Q", value)
