"""Unit tests for the pure-stdlib baseline JPEG codec
(functions/jpeg.py): exact round trip on the DC-only class, fidelity
(PSNR) on general content, spec-level marker layout, and unsupported-
process rejection.  The distributed query (`image_jpeg_decode`) is
value-oracled separately in tests/test_oracle.py."""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_assigment3_spark.functions.jpeg import (
    jpeg_decode_gray,
    jpeg_encode_gray,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean())
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_block_constant_even_values_roundtrip_exactly():
    """8x8-constant blocks with even values survive the DC path
    bit-exactly (AC exactly zero, DC step 16 divides 8*(v-128))."""
    rng = np.random.default_rng(7)
    for shape in [(3, 4), (1, 1), (5, 2)]:
        bvals = (rng.integers(0, 128, shape) * 2).astype(np.uint8)
        img = np.kron(bvals, np.ones((8, 8), np.uint8))
        np.testing.assert_array_equal(jpeg_decode_gray(jpeg_encode_gray(img)), img)


def test_fidelity_on_general_content():
    yy, xx = np.mgrid[0:48, 0:64]
    smooth = ((yy * 2 + xx * 3) % 256).astype(np.uint8)
    assert _psnr(jpeg_decode_gray(jpeg_encode_gray(smooth)), smooth) > 30
    noise = np.random.default_rng(1).integers(0, 256, (24, 40)).astype(np.uint8)
    assert _psnr(jpeg_decode_gray(jpeg_encode_gray(noise)), noise) > 18


def test_non_multiple_of_8_dims_crop_back():
    yy, xx = np.mgrid[0:45, 0:61]
    img = ((yy * 5 + xx * 2) % 256).astype(np.uint8)
    out = jpeg_decode_gray(jpeg_encode_gray(img))
    assert out.shape == img.shape
    assert _psnr(out, img) > 28


def test_marker_layout_is_spec_exact():
    img = np.full((8, 8), 128, np.uint8)
    blob = jpeg_encode_gray(img)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert blob[2:4] == b"\xff\xe0" and blob[6:11] == b"JFIF\x00"
    # every 0xFF inside the entropy segment must be stuffed or a marker
    sos = blob.index(b"\xff\xda")
    scan = blob[sos + 2 + int.from_bytes(blob[sos + 2 : sos + 4], "big") : -2]
    for i, b in enumerate(scan[:-1]):
        if b == 0xFF:
            assert scan[i + 1] == 0x00, "unstuffed 0xFF in entropy data"


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError, match="uint8"):
        jpeg_encode_gray(np.zeros((8, 8), np.int32))
    with pytest.raises(ValueError, match="uint8"):
        jpeg_encode_gray(np.zeros((8, 8, 3), np.uint8))


def test_decoder_rejects_unsupported_and_malformed():
    good = jpeg_encode_gray(np.full((8, 8), 100, np.uint8))
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode_gray(b"\x89PNG" + good[4:])
    prog = bytearray(good)
    sof = prog.index(b"\xff\xc0")
    prog[sof + 1] = 0xC2  # progressive
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode_gray(bytes(prog))
    with pytest.raises(ValueError, match="missing EOI|missing SOF0 or SOS"):
        jpeg_decode_gray(good[:-2])
    truncated = good[: good.index(b"\xff\xda") + 8]
    with pytest.raises(ValueError):
        jpeg_decode_gray(truncated)
