"""Property-based round-trip tests (hypothesis) for the hand-rolled
codecs: any shape, any content, any filter choice — lossless formats
must round-trip bit-exactly, and JPEG's lossless class must stay
lossless.  Complements the example-based tests in test_png/jpeg/nifti."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from bigdata_assigment3_spark.functions.jpeg import (
    jpeg_decode_gray,
    jpeg_encode_gray,
)
from bigdata_assigment3_spark.functions.nifti import nifti1_bytes, parse_nifti1
from bigdata_assigment3_spark.functions.png import png_decode, png_encode


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=8),
)
def test_png_gray_roundtrip_any_shape_any_filters(h, w, seed, filters):
    arr = np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)
    blob = png_encode(arr, filter_for_row=lambda y: filters[y % len(filters)])
    np.testing.assert_array_equal(png_decode(blob), arr)


@settings(max_examples=15, deadline=None)
@given(h=st.integers(1, 12), w=st.integers(1, 12), seed=st.integers(0, 2**31))
def test_png_rgb_roundtrip(h, w, seed):
    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    np.testing.assert_array_equal(png_decode(png_encode(arr)), arr)


@settings(max_examples=20, deadline=None)
@given(
    bh=st.integers(1, 4),
    bw=st.integers(1, 4),
    seed=st.integers(0, 2**31),
)
def test_jpeg_lossless_class_stays_lossless(bh, bw, seed):
    """Block-constant even-valued images are the codec's provable
    lossless class — hypothesis sweeps block layouts and contents."""
    bvals = (np.random.default_rng(seed).integers(0, 128, (bh, bw)) * 2).astype(np.uint8)
    img = np.kron(bvals, np.ones((8, 8), np.uint8))
    np.testing.assert_array_equal(jpeg_decode_gray(jpeg_encode_gray(img)), img)


@settings(max_examples=15, deadline=None)
@given(
    z=st.integers(1, 6),
    y=st.integers(1, 6),
    x=st.integers(1, 6),
    seed=st.integers(0, 2**31),
    dt=st.sampled_from(["int8", "uint8", "int16", "float32"]),
)
def test_nifti_roundtrip_any_shape(z, y, x, seed, dt):
    rng = np.random.default_rng(seed)
    if dt == "float32":
        arr = rng.standard_normal((z, y, x)).astype(dt)
    else:
        info = np.iinfo(dt)
        arr = rng.integers(info.min, info.max, (z, y, x), endpoint=True).astype(dt)
    fields, back = parse_nifti1(nifti1_bytes(arr, (1.0, 1.0, 1.0)))
    np.testing.assert_array_equal(back, arr)
    assert fields["dim"] == (x, y, z)


@settings(max_examples=20, deadline=None)
@given(
    bh=st.integers(1, 4),
    bw=st.integers(1, 4),
    seed=st.integers(0, 2**31),
)
def test_jpeg_q100_lattice_class_stays_lossless(bh, bw, seed):
    """Quality-100 widening (round 8): any {0,4}x{0,4}-lattice-textured
    image — a + b*sig(x) + c*sig(y) + d*sig(x)*sig(y) per block — must
    round-trip pixel-exact through the exact integer IDCT path,
    whatever the block layout and coefficient draw."""
    from bigdata_assigment3_spark.functions.jpeg import QTABLE_Q100, SIG44

    rng = np.random.default_rng(seed)
    sx = np.tile(SIG44, bw)[None, :]
    sy = np.tile(SIG44, bh)[:, None]
    ones = np.ones((8, 8), np.int64)
    a = rng.integers(64, 192, (bh, bw))
    b = rng.integers(-15, 16, (bh, bw))
    c = rng.integers(-15, 16, (bh, bw))
    d = rng.integers(-15, 16, (bh, bw))
    A, B, C, D = (np.kron(m, ones) for m in (a, b, c, d))
    img = (A + B * sx + C * sy + D * sx * sy).astype(np.uint8)
    back = jpeg_decode_gray(jpeg_encode_gray(img, qtable=QTABLE_Q100))
    np.testing.assert_array_equal(back, img)
