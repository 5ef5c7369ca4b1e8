"""Pure-stdlib PNG codec: minimal encoder with per-scanline filter
control + a spec-correct decoder reconstructing all five filters.

The reference decodes arbitrary rasters via ``cv2.imdecode``
(reference `HOUGH Transform/hough_heart_detector.py:36-40`); cv2/PIL
are absent from this sandbox, but PNG is a published spec (RFC 2083 /
ISO 15948) built on zlib — signature, CRC-32 chunk framing, IHDR/IDAT/
IEND, and the five scanline filters (None/Sub/Up/Average/Paeth) are
fully implementable with ``zlib`` + ``struct`` + ``numpy``, the same
approach as this repo's DICOM / NIfTI / WAV / Y4M codecs.

Supported pixel formats: 8-bit grayscale (color type 0) and 8-bit RGB
(color type 2), no interlace — the formats an analytics pipeline's
thumbnail/mask artifacts actually use.  The encoder exists so the
decoder can be held to a pixel-exact value oracle without any image
library in the container; its ``filter_for_row`` hook forces every
filter type under the gate.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Callable

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _filter_scanline(ftype: int, raw: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    """Apply filter ``ftype`` to one raw scanline (uint8, flat bytes)."""
    r = raw.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), r[:-bpp]])
    up = prior.astype(np.int32)
    ul = np.concatenate([np.zeros(bpp, np.int32), up[:-bpp]])
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - (left + up) // 2
    elif ftype == 4:
        p = left + up - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
        out = r - pred
    else:
        raise ValueError(f"bad filter type {ftype}")
    return (out % 256).astype(np.uint8)


def png_encode(
    arr: np.ndarray, filter_for_row: Callable[[int], int] | None = None
) -> bytes:
    """Encode a uint8 ``(H, W)`` grayscale or ``(H, W, 3)`` RGB array
    as a complete PNG byte string.  ``filter_for_row(y)`` picks the
    scanline filter (default: 0/None) — used by tests and fixtures to
    force all five filters through the decoder."""
    if arr.dtype != np.uint8:
        raise ValueError(f"expected uint8, got {arr.dtype}")
    if arr.ndim == 2:
        color_type, bpp = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, bpp = 2, 3
    else:
        raise ValueError(f"expected (H,W) or (H,W,3), got shape {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = arr.reshape(h, w * bpp)
    prior = np.zeros(w * bpp, np.uint8)
    stream = bytearray()
    for y in range(h):
        ftype = filter_for_row(y) if filter_for_row else 0
        stream.append(ftype)
        stream += _filter_scanline(ftype, rows[y], prior, bpp).tobytes()
        prior = rows[y]
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(stream)))
        + _chunk(b"IEND", b"")
    )


def _unfilter_scanline(ftype: int, filt: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    """Reconstruct one scanline from its filtered bytes (PNG spec
    'Filtering' — inverse of :func:`_filter_scanline`).  Up (2) is
    vectorized; Sub/Average/Paeth carry a left-to-right dependency on
    reconstructed bytes, so they walk the line (scanlines are short;
    at scale this stays inside the per-file kernel)."""
    f = filt.astype(np.int32)
    up = prior.astype(np.int32)
    if ftype == 0:
        return filt.copy()
    if ftype == 2:
        return ((f + up) % 256).astype(np.uint8)
    n = len(filt)
    out = np.zeros(n, np.int32)
    ul = np.concatenate([np.zeros(bpp, np.int32), up[:-bpp]])
    for x in range(n):
        left = out[x - bpp] if x >= bpp else 0
        if ftype == 1:
            pred = left
        elif ftype == 3:
            pred = (left + up[x]) // 2
        elif ftype == 4:
            a, b, c = left, up[x], ul[x]
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[x] = (f[x] + pred) % 256
    return out.astype(np.uint8)


def png_decode(blob: bytes, with_filters: bool = False):
    """Decode a PNG byte string to a uint8 ``(H, W)`` or ``(H, W, 3)``
    array, validating everything a real reader must: signature,
    per-chunk CRC-32, IHDR-first ordering, supported format (8-bit,
    color type 0 or 2, no interlace), IEND termination, and exact
    decompressed-stream length.  With ``with_filters=True`` returns
    ``(array, per_scanline_filter_bytes)`` so callers can assert which
    filters the file actually used."""
    if blob[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat, ended = 8, None, bytearray(), False
    while pos < len(blob):
        if pos + 8 > len(blob):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        payload = blob[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(blob):
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if crc != (zlib.crc32(tag + payload) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if ihdr is None and tag != b"IHDR":
            raise ValueError(f"first chunk is {tag!r}, expected IHDR")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not ended:
        raise ValueError("missing IHDR or IEND")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or comp != 0 or filt_method != 0:
        raise ValueError(
            f"unsupported format (depth={depth}, color={color_type}, "
            f"compression={comp}, filter_method={filt_method})"
        )
    if interlace != 0:
        raise ValueError("Adam7 interlace not supported")
    bpp = 1 if color_type == 0 else 3
    if not idat:
        raise ValueError("missing IDAT chunk")
    try:
        inflated = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT deflate stream: {exc}") from exc
    stream = np.frombuffer(inflated, dtype=np.uint8)
    if stream.size != h * (1 + w * bpp):
        raise ValueError("decompressed stream length != h * (1 + w*bpp)")
    lines = stream.reshape(h, 1 + w * bpp)
    out = np.zeros((h, w * bpp), np.uint8)
    prior = np.zeros(w * bpp, np.uint8)
    for y in range(h):
        prior = _unfilter_scanline(int(lines[y, 0]), lines[y, 1:], prior, bpp)
        out[y] = prior
    img = out if color_type == 0 else out.reshape(h, w, 3)
    return (img, lines[:, 0].copy()) if with_filters else img
