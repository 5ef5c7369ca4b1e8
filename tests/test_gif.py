"""Unit tests for the pure-stdlib GIF/LZW codec (functions/gif.py).
The distributed query (`gif_frames_decode`) is value-oracled in
tests/test_oracle.py."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from bigdata_assigment3_spark.functions.gif import gif_decode_gray, gif_encode_gray


def test_animated_roundtrip_exact():
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:40, 0:56]
    frames = [
        rng.integers(0, 256, (40, 56)).astype(np.uint8),  # noise: dict churn
        ((yy * 3 + xx * 5) % 256).astype(np.uint8),  # gradient
        np.zeros((40, 56), np.uint8),  # flat: long runs
    ]
    back = gif_decode_gray(gif_encode_gray(frames))
    assert len(back) == 3
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a, b)


def test_lzw_table_reset_path():
    """A large noise frame exceeds 4096 dictionary entries, forcing
    CLEAR-reset mid-stream; must stay bit-exact."""
    huge = np.random.default_rng(9).integers(0, 256, (128, 200)).astype(np.uint8)
    np.testing.assert_array_equal(gif_decode_gray(gif_encode_gray([huge]))[0], huge)


def test_lzw_actually_compresses():
    flat = np.full((100, 100), 42, np.uint8)
    assert len(gif_encode_gray([flat])) < 1200  # 10000 px + 768B palette


@settings(max_examples=20, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24), n=st.integers(1, 3), seed=st.integers(0, 2**31))
def test_roundtrip_property(h, w, n, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w)).astype(np.uint8) for _ in range(n)]
    back = gif_decode_gray(gif_encode_gray(frames))
    assert len(back) == n
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a, b)


def test_layout_is_spec_exact():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = gif_encode_gray([img])
    assert blob[:6] == b"GIF89a"
    assert blob[-1:] == b"\x3b"  # trailer
    # grayscale GCT: entry i is (i, i, i)
    assert blob[13:16] == b"\x00\x00\x00" and blob[13 + 3 * 255 : 13 + 3 * 256] == b"\xff\xff\xff"


def test_malformed_rejection():
    good = gif_encode_gray([np.zeros((4, 4), np.uint8)])
    with pytest.raises(ValueError, match="signature"):
        gif_decode_gray(b"PNG" + good[3:])
    with pytest.raises(ValueError, match="trailer"):
        gif_decode_gray(good[:-1])
    interlaced = bytearray(good)
    desc = 13 + 3 * 256  # header + screen descriptor + grayscale GCT
    assert interlaced[desc] == 0x2C
    interlaced[desc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        gif_decode_gray(bytes(interlaced))
    with pytest.raises(ValueError):
        gif_encode_gray([])
    with pytest.raises(ValueError):
        gif_encode_gray([np.zeros((2, 2), np.int16)])


def test_truncated_mid_subblock_raises_valueerror():
    """A GIF cut mid-sub-block must raise the documented ValueError,
    not IndexError — the scan loops bound-check `pos` before reading
    each length byte (both the extension-skip and data-block loops)."""
    good = gif_encode_gray([np.zeros((8, 8), np.uint8)])
    desc = 13 + 3 * 256
    assert good[desc] == 0x2C
    # cut inside the LZW data sub-blocks (after descriptor + min-code +
    # first length byte) so the `while blob[pos]` scan would run off
    for cut in (desc + 12, len(good) - 3):
        with pytest.raises(ValueError, match="truncated|trailer"):
            gif_decode_gray(good[:cut])
    # truncated mid-EXTENSION sub-block: splice a comment extension
    # whose declared sub-block length exceeds the remaining bytes
    spliced = good[:desc] + b"\x21\xfe\x20ab"  # claims 32 bytes, has 2
    with pytest.raises(ValueError, match="truncated"):
        gif_decode_gray(spliced)


def test_final_code_on_width_boundary():
    """Regression (hypothesis find): when the LAST data code's implied
    decoder add lands exactly on a width boundary (e.g. 254 data codes
    after CLEAR -> table 511), the decoder reads EOI one bit wider —
    the encoder must mirror that growth or the stream truncates."""
    arr = np.random.default_rng(16).integers(0, 256, (16, 16)).astype(np.uint8)
    np.testing.assert_array_equal(gif_decode_gray(gif_encode_gray([arr]))[0], arr)


def test_truncated_descriptor_and_header_raise_valueerror():
    """Round-8 hardening: EVERY truncation point must raise the
    documented ValueError — a cut inside the image descriptor used to
    leak struct.error, a cut right before the min-code byte leaked
    IndexError, and a short header/palette leaked struct/IndexError."""
    good = gif_encode_gray([np.zeros((8, 8), np.uint8)])
    desc = 13 + 3 * 256
    assert good[desc] == 0x2C
    # cut mid-image-descriptor (0x2C seen, <9 descriptor bytes left)
    # and right before the min-code byte (9 bytes, no 10th)
    for cut in (desc + 1, desc + 5, desc + 10):
        with pytest.raises(ValueError, match="truncated GIF image descriptor"):
            gif_decode_gray(good[:cut])
    # short screen descriptor and mid-palette cuts
    with pytest.raises(ValueError, match="truncated GIF screen descriptor"):
        gif_decode_gray(good[:10])
    with pytest.raises(ValueError, match="truncated GIF global color table"):
        gif_decode_gray(good[:100])
    # declared data sub-block longer than the remaining bytes
    kept = good[: desc + 11]  # block byte + descriptor + min-code
    spliced = kept + b"\xff" + b"ab"  # length byte claims 255, has 2
    with pytest.raises(ValueError, match="truncated GIF sub-block"):
        gif_decode_gray(spliced)
