"""Hand-rolled Avro Object Container File (OCF) writer + reader.

Avro is the row-interchange workhorse of data engineering (Kafka
topics, warehouse exports); no avro library ships in this sandbox,
but the container format is a short published spec (Apache Avro 1.x
"Object Container Files" + binary encoding): magic ``Obj\\x01``, a
file-metadata map carrying the writer schema JSON and codec, a random
16-byte sync marker, then data blocks of (record count, byte size,
records, sync marker), with longs as zigzag varints and strings as
length-prefixed UTF-8.

Scope: null codec, flat record schemas whose fields are ``long`` or
``string`` — the shape analytic exports actually use.  The reader
validates magic, codec, schema field order/types, per-block sync
markers, and exact block sizes (raises ValueError otherwise).
"""

from __future__ import annotations

import json
import struct

MAGIC = b"Obj\x01"


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _bytes_block(b: bytes) -> bytes:
    return _zigzag_encode(len(b)) + b


def avro_ocf_bytes(
    records: list[dict], fields: list[tuple[str, str]], sync: bytes
) -> bytes:
    """Serialize ``records`` (dicts) as a complete OCF with the given
    ``fields`` schema ([(name, 'long'|'string'), ...]) and 16-byte
    ``sync`` marker, one data block per call."""
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": n, "type": t} for n, t in fields],
    }
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
    }
    hdr = bytearray(MAGIC)
    hdr += _zigzag_encode(len(meta))
    for k, v in meta.items():
        hdr += _bytes_block(k.encode()) + _bytes_block(v)
    hdr += _zigzag_encode(0)  # map terminator
    hdr += sync

    body = bytearray()
    for rec in records:
        for name, typ in fields:
            v = rec[name]
            if typ == "long":
                body += _zigzag_encode(int(v))
            elif typ == "string":
                body += _bytes_block(str(v).encode("utf-8"))
            else:
                raise ValueError(f"unsupported field type {typ}")
    return (
        bytes(hdr)
        + _zigzag_encode(len(records))
        + _zigzag_encode(len(body))
        + bytes(body)
        + sync
    )


def read_avro_ocf(blob: bytes) -> tuple[list[tuple[str, str]], list[dict]]:
    """Parse an OCF back into (fields, records), validating everything
    a real reader must — decoded FROM THE BYTES, nothing assumed."""
    if blob[:4] != MAGIC:
        raise ValueError("not an Avro OCF (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(blob, pos)
        if n == 0:
            break
        if n < 0:  # negative count => size follows (spec); normalize
            n = -n
            _, pos = _zigzag_decode(blob, pos)
        if n > len(blob):  # a map can't hold more entries than bytes
            raise ValueError("metadata map count exceeds file size")
        for _ in range(n):
            klen, pos = _zigzag_decode(blob, pos)
            if klen < 0 or pos + klen > len(blob):
                raise ValueError("metadata key overruns file")
            key = blob[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _zigzag_decode(blob, pos)
            if vlen < 0 or pos + vlen > len(blob):
                raise ValueError("metadata value overruns file")
            meta[key] = blob[pos : pos + vlen]
            pos += vlen
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    if schema.get("type") != "record":
        raise ValueError("only record schemas supported")
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    if any(t not in ("long", "string") for _, t in fields):
        raise ValueError("only long/string fields supported")
    sync = blob[pos : pos + 16]
    pos += 16

    records: list[dict] = []
    while pos < len(blob):
        count, pos = _zigzag_decode(blob, pos)
        size, pos = _zigzag_decode(blob, pos)
        if count < 0 or size < 0 or count > size + 1:
            raise ValueError("implausible block header (count/size)")
        block_end = pos + size
        if block_end + 16 > len(blob):
            raise ValueError("block overruns file")
        for _ in range(count):
            rec = {}
            for name, typ in fields:
                if typ == "long":
                    rec[name], pos = _zigzag_decode(blob, pos)
                else:
                    slen, pos = _zigzag_decode(blob, pos)
                    if slen < 0 or pos + slen > block_end:
                        raise ValueError("string overruns block")
                    rec[name] = blob[pos : pos + slen].decode("utf-8")
                    pos += slen
            records.append(rec)
        if pos != block_end:
            raise ValueError("block size does not match decoded records")
        if blob[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch after block")
        pos += 16
    return fields, records
