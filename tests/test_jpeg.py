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


def test_q100_lattice_texture_roundtrips_exactly():
    """Round-8 widening: at quality 100, images whose per-block DCT
    support lies on the {0,4}x{0,4} lattice — real texture, pixel form
    a + b*sig(x) + c*sig(y) + d*sig(x)*sig(y) — round-trip PIXEL-EXACT
    through the exact integer IDCT path (every basis product +-1/8)."""
    from bigdata_assigment3_spark.functions.jpeg import QTABLE_Q100, SIG44

    rng = np.random.default_rng(8)
    for bh, bw in [(3, 4), (1, 1), (2, 5)]:
        sx = np.tile(SIG44, bw)[None, :]
        sy = np.tile(SIG44, bh)[:, None]
        ones = np.ones((8, 8), np.int64)
        a = rng.integers(64, 192, (bh, bw))
        b = rng.integers(-15, 16, (bh, bw))
        c = rng.integers(-15, 16, (bh, bw))
        d = rng.integers(-15, 16, (bh, bw))
        A, B, C, D = (np.kron(m, ones) for m in (a, b, c, d))
        v = (A + B * sx + C * sy + D * sx * sy).astype(np.uint8)
        assert v.std() > 0, "fixture must be textured, not flat"
        back = jpeg_decode_gray(jpeg_encode_gray(v, qtable=QTABLE_Q100))
        np.testing.assert_array_equal(back, v)


def test_q100_off_lattice_takes_float_path_and_stays_close():
    """Energy OFF the lattice (any other frequency) must still decode
    through the float IDCT with near-lossless fidelity at q100 — the
    exact path only claims the class it can prove."""
    from bigdata_assigment3_spark.functions.jpeg import QTABLE_Q100

    yy, xx = np.mgrid[0:16, 0:24]
    img = ((yy * 7 + xx * 3) % 256).astype(np.uint8)  # ramp: all freqs
    out = jpeg_decode_gray(jpeg_encode_gray(img, qtable=QTABLE_Q100))
    assert _psnr(out, img) > 45  # q100: only round(DCT) loss remains


def test_exact_idct_matches_float_idct_on_lattice_blocks():
    """The integer fast path and the float path must agree on every
    lattice block (the fast path is an optimization with a proof, not
    a different decoder)."""
    from bigdata_assigment3_spark.functions.jpeg import DCT_M, SIG44

    rng = np.random.default_rng(9)
    for _ in range(100):
        deq = np.zeros((8, 8), np.int64)
        deq[np.ix_([0, 4], [0, 4])] = rng.integers(-1000, 1000, (2, 2))
        num = (
            deq[0, 0]
            + deq[0, 4] * SIG44[None, :]
            + deq[4, 0] * SIG44[:, None]
            + deq[4, 4] * SIG44[:, None] * SIG44[None, :]
        )
        exact = num / 8.0
        fl = DCT_M.T @ deq.astype(np.float64) @ DCT_M
        assert np.allclose(exact, fl, atol=1e-9)
        # after the shared final round the two paths agree wherever
        # num/8 is not an exact .5 tie (the float path resolves ties by
        # epsilon-luck; both production fixture classes are tie-free:
        # flat blocks give num = 16*DC, lattice fixtures num = 8*int)
        tie_free = (num % 8) != 4
        np.testing.assert_array_equal(
            np.round(exact)[tie_free], np.round(fl)[tie_free]
        )


def test_encoder_rejects_bad_qtable():
    with pytest.raises(ValueError, match="quantization table"):
        jpeg_encode_gray(np.zeros((8, 8), np.uint8), qtable=np.zeros((8, 8)))
    with pytest.raises(ValueError, match="quantization table"):
        jpeg_encode_gray(np.zeros((8, 8), np.uint8), qtable=np.ones((4, 4)))
