"""Pure-stdlib GIF codec: GIF89a encoder + decoder with real LZW.

Third leg of the raster-codec set (PNG: functions/png.py, JPEG:
functions/jpeg.py; reference decodes rasters via ``cv2.imdecode``,
`HOUGH Transform/hough_heart_detector.py:36-40`).  Implemented from
the published GIF89a specification: header + logical screen
descriptor, 256-entry grayscale global color table, per-frame image
descriptors, and the GIF variant of LZW — variable-width codes
(LSB-first bit packing), CLEAR/EOI control codes, dictionary growth to
4096 entries with CLEAR-reset, 255-byte data sub-blocks.  GIF is
lossless over a palette, so round trips are bit-exact and the
distributed decode query can be held to a DuckDB value oracle.

Scope (ValueError outside it): 8-bit global palette, no interlace, no
transparency/disposal extensions; multi-frame (animation) supported —
each frame a full-size image descriptor.
"""

from __future__ import annotations

import struct

import numpy as np

_MIN_CODE_SIZE = 8  # 256-entry palette
_CLEAR = 1 << _MIN_CODE_SIZE  # 256
_EOI = _CLEAR + 1  # 257
_TABLE_LIMIT = 4096


class _LSBBitWriter:
    """GIF packs LZW codes least-significant-bit first."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


def _lzw_encode(data: bytes) -> bytes:
    bw = _LSBBitWriter()
    width = _MIN_CODE_SIZE + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << _MIN_CODE_SIZE)}
    next_free = _EOI + 1
    bw.write(_CLEAR, width)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        bw.write(table[w], width)
        if next_free < _TABLE_LIMIT:
            table[wc] = next_free
            next_free += 1
            if next_free == (1 << width) and width < 12:
                width += 1
        else:  # table full: reset, per spec
            bw.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(1 << _MIN_CODE_SIZE)}
            next_free = _EOI + 1
            width = _MIN_CODE_SIZE + 1
        w = bytes([byte])
    if w:
        bw.write(table[w], width)
        # phantom add: the DECODER performs an add upon reading this
        # final code, and if that lands exactly on a width boundary it
        # reads EOI one bit wider — mirror its growth here (hypothesis
        # caught this: 254 data codes since CLEAR -> table hits 511 ->
        # decoder reads EOI at 10 bits while the encoder wrote 9)
        if next_free < _TABLE_LIMIT:
            next_free += 1
            if next_free == (1 << width) and width < 12:
                width += 1
    bw.write(_EOI, width)
    return bw.flush()


def _lzw_decode(data: bytes, expected: int) -> bytes:
    width = _MIN_CODE_SIZE + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << _MIN_CODE_SIZE)]
    table += [b"", b""]  # CLEAR, EOI placeholders
    out = bytearray()
    prev: bytes | None = None
    pos = nbits = acc = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == _CLEAR:
            table = [bytes([i]) for i in range(1 << _MIN_CODE_SIZE)] + [b"", b""]
            width = _MIN_CODE_SIZE + 1
            prev = None
            continue
        if code == _EOI:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the cScSc special case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and len(table) < _TABLE_LIMIT:
            table.append(prev + entry[:1])
            # the decoder's table lags the encoder's by one entry (its
            # add for code k happens while reading code k+1), so the
            # width must grow one entry EARLY — the spec's classic trap
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
        if len(out) > expected:
            raise ValueError("LZW output exceeds declared frame size")
    if len(out) != expected:
        raise ValueError(f"LZW produced {len(out)} of {expected} expected pixels")
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    return bytes(out)


def gif_encode_gray(frames: list[np.ndarray]) -> bytes:
    """Encode uint8 (H, W) frames as an animated grayscale GIF89a."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    for f in frames:
        if f.dtype != np.uint8 or f.ndim != 2 or f.shape != (h, w):
            raise ValueError("all frames must be uint8 (H, W) of equal shape")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, 8 bits/channel, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):  # grayscale global color table
        out += bytes([i, i, i])
    for f in frames:
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
        out.append(_MIN_CODE_SIZE)
        out += _sub_blocks(_lzw_encode(f.tobytes()))
    out += b"\x3b"  # trailer
    return bytes(out)


def gif_decode_gray(blob: bytes) -> list[np.ndarray]:
    """Decode a grayscale GIF into its list of (H, W) uint8 frames,
    validating signature, screen descriptor, palette grayness, LZW
    stream integrity, and trailer."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(blob) < 13:
        raise ValueError("truncated GIF screen descriptor")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    if not flags & 0x80:
        raise ValueError("missing global color table")
    gct_size = 2 << (flags & 7)
    if len(blob) < pos + 3 * gct_size:
        raise ValueError("truncated GIF global color table")
    palette = blob[pos : pos + 3 * gct_size]
    pos += 3 * gct_size
    if gct_size != 256 or any(
        palette[3 * i] != palette[3 * i + 1] or palette[3 * i] != palette[3 * i + 2]
        for i in range(gct_size)
    ):
        raise ValueError("expected a 256-entry grayscale palette")
    index_of = [palette[3 * i] for i in range(gct_size)]

    frames: list[np.ndarray] = []
    while pos < len(blob):
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return frames
        if block == 0x21:  # extension: skip sub-blocks
            pos += 1  # label
            while True:
                if pos >= len(blob):
                    raise ValueError("truncated GIF sub-block")
                if not blob[pos]:
                    break
                pos += 1 + blob[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected block {block:#x}")
        # 9 descriptor bytes + 1 min-code byte must both be present, so
        # every truncation path raises the same documented ValueError
        # (struct.error / IndexError would leak otherwise)
        if pos + 10 > len(blob):
            raise ValueError("truncated GIF image descriptor")
        fx, fy, fw, fh, iflags = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        if iflags & 0x40:
            raise ValueError("interlaced frames not supported")
        if iflags & 0x80:
            raise ValueError("local color tables not supported")
        if (fx, fy, fw, fh) != (0, 0, w, h):
            raise ValueError("partial-canvas frames not supported")
        min_code = blob[pos]
        pos += 1
        if min_code != _MIN_CODE_SIZE:
            raise ValueError(f"unexpected LZW min code size {min_code}")
        data = bytearray()
        while True:
            if pos >= len(blob):
                raise ValueError("truncated GIF sub-block")
            n = blob[pos]
            if not n:
                break
            if pos + 1 + n > len(blob):
                raise ValueError("truncated GIF sub-block")
            data += blob[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = np.frombuffer(_lzw_decode(bytes(data), w * h), dtype=np.uint8)
        # map through the palette — index != value would be a real bug
        lut = np.array(index_of, dtype=np.uint8)
        frames.append(lut[idx].reshape(h, w))
    raise ValueError("missing GIF trailer")
