"""Unit tests for the pure-stdlib PNG codec (functions/png.py):
pixel-exact round trips for every filter type in both supported pixel
formats, spec-level byte layout, and malformed-input rejection.  The
distributed query (`image_png_decode`) is value-oracled separately in
tests/test_oracle.py."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from bigdata_assigment3_spark.functions.png import png_decode, png_encode


def _gray(h=13, w=17, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)


def _rgb(h=11, w=9, seed=1):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("make", [_gray, _rgb], ids=["gray", "rgb"])
def test_roundtrip_each_filter(ftype, make):
    arr = make()
    blob = png_encode(arr, filter_for_row=lambda y: ftype)
    back, filters = png_decode(blob, with_filters=True)
    np.testing.assert_array_equal(back, arr)
    assert set(filters.tolist()) == {ftype}


def test_roundtrip_mixed_filters_and_edge_shapes():
    # rotating filters; 1-pixel-wide and 1-row-tall edge cases
    for arr in [_gray(25, 32, 7), _gray(1, 40, 8), _gray(40, 1, 9), _rgb(10, 1, 3)]:
        blob = png_encode(arr, filter_for_row=lambda y: y % 5)
        np.testing.assert_array_equal(png_decode(blob), arr)


def test_byte_layout_is_spec_exact():
    arr = _gray(4, 6)
    blob = png_encode(arr)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR: length 13, width/height big-endian, depth 8, gray, no interlace
    assert struct.unpack_from(">I", blob, 8)[0] == 13
    assert blob[12:16] == b"IHDR"
    w, h, depth, color, comp, filt, inter = struct.unpack_from(">IIBBBBB", blob, 16)
    assert (w, h, depth, color, comp, filt, inter) == (6, 4, 8, 0, 0, 0, 0)
    assert blob.endswith(b"IEND" + struct.pack(">I", zlib.crc32(b"IEND")))


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError, match="uint8"):
        png_encode(np.zeros((2, 2), np.int16))
    with pytest.raises(ValueError, match="shape"):
        png_encode(np.zeros((2, 2, 4), np.uint8))


def test_decoder_rejects_malformed():
    good = png_encode(_gray())
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF" + good[4:])
    corrupt = bytearray(good)
    corrupt[20] ^= 0xFF  # flip a byte inside IHDR payload
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated|missing"):
        png_decode(good[:40])
    # unsupported: 16-bit depth advertised in an otherwise-valid IHDR
    deep = bytearray(good)
    deep[24] = 16
    struct.pack_into(
        ">I", deep, 29, zlib.crc32(bytes(deep[12:29])) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="unsupported"):
        png_decode(bytes(deep))


def test_corrupt_idat_and_missing_idat_raise_valueerror():
    """Review finding: corrupt deflate bytes raised zlib.error and a
    chunk-valid file without IDAT slipped to decompress; both must be
    the parser's own ValueError."""
    import zlib as _z

    good = png_encode(_gray())
    # rebuild the IDAT chunk with garbage payload but a VALID CRC
    start = good.index(b"IDAT") - 4
    (ln,) = struct.unpack_from(">I", good, start)
    garbage = b"\x00" * ln
    rebuilt = (
        good[:start]
        + struct.pack(">I", ln)
        + b"IDAT"
        + garbage
        + struct.pack(">I", _z.crc32(b"IDAT" + garbage))
        + good[start + 12 + ln :]
    )
    with pytest.raises(ValueError, match="corrupt IDAT"):
        png_decode(rebuilt)
    # remove IDAT entirely (keep IHDR/IEND): must raise, not zlib.error
    no_idat = good[:start] + good[start + 12 + ln :]
    with pytest.raises(ValueError, match="missing IDAT"):
        png_decode(no_idat)
