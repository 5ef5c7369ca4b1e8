"""Unit tests for the hand-rolled NIfTI-1 writer/parser
(functions/nifti.py) — every DT_CODES dtype round-trips bit-exactly,
header fields decode to what was written, and malformed inputs are
rejected (the invariants a reader like nibabel would enforce; ref
`Hidden_MarkovModels/brain_segmentation.py:433-438` uses nib.save)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bigdata_assigment3_spark.functions.nifti import (
    DT_CODES,
    MAGIC,
    SIZEOF_HDR,
    nifti1_bytes,
    parse_nifti1,
)


def _vol(dtype: np.dtype) -> np.ndarray:
    rng = np.random.default_rng(42)
    if np.issubdtype(dtype, np.floating):
        return rng.standard_normal((4, 5, 6)).astype(dtype)
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max, size=(4, 5, 6), endpoint=True).astype(dtype)


@pytest.mark.parametrize("dtype", sorted(DT_CODES, key=str))
def test_roundtrip_every_dtype(dtype):
    arr = _vol(dtype)
    blob = nifti1_bytes(arr, (0.9, 1.1, 2.5), descrip="unit test")
    fields, back = parse_nifti1(blob)
    np.testing.assert_array_equal(back, arr)
    assert back.dtype == dtype
    assert fields["sizeof_hdr"] == SIZEOF_HDR
    assert fields["dim"] == (6, 5, 4)  # (nx, ny, nz) for a (Z=4,Y=5,X=6) array
    dt_code, bitpix = DT_CODES[dtype]
    assert fields["datatype"] == dt_code
    assert fields["bitpix"] == bitpix
    assert fields["vox_offset"] == 352
    np.testing.assert_allclose(fields["pixdim"], (0.9, 1.1, 2.5), rtol=1e-6)
    assert fields["scl_slope"] == 1.0 and fields["scl_inter"] == 0.0
    assert fields["qform_code"] == 0 and fields["sform_code"] == 1
    # sform is the diagonal spacing affine
    np.testing.assert_allclose(
        fields["srow"][:, :3],
        np.diag([0.9, 1.1, 2.5]),
        rtol=1e-6,
    )
    assert fields["magic"] == MAGIC
    assert fields["descrip"] == "unit test"
    assert len(blob) == 352 + arr.nbytes


def test_file_layout_is_spec_exact():
    """Byte-level spec checks independent of the parser: header size,
    extension indicator, x-fastest data ordering."""
    arr = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    blob = nifti1_bytes(arr, (1.0, 1.0, 1.0))
    assert struct.unpack_from("<i", blob, 0)[0] == 348
    assert blob[344:348] == b"n+1\x00"
    assert blob[348:352] == b"\x00\x00\x00\x00"  # no extensions
    # dim = [3, nx, ny, nz, 1, 1, 1, 1]
    assert struct.unpack_from("<8h", blob, 40) == (3, 4, 3, 2, 1, 1, 1, 1)
    # x varies fastest: the first row of the first slice is bytes 352..360
    np.testing.assert_array_equal(
        np.frombuffer(blob, dtype=np.int16, count=4, offset=352),
        np.array([0, 1, 2, 3], dtype=np.int16),
    )


def test_writer_rejects_bad_input():
    with pytest.raises(ValueError, match="ndim"):
        nifti1_bytes(np.zeros((2, 2), dtype=np.uint8), (1, 1, 1))
    with pytest.raises(ValueError, match="unsupported dtype"):
        nifti1_bytes(np.zeros((2, 2, 2), dtype=np.float64), (1, 1, 1))


def test_parser_rejects_malformed():
    good = nifti1_bytes(np.zeros((2, 2, 2), dtype=np.uint8), (1, 1, 1))
    with pytest.raises(ValueError, match="truncated"):
        parse_nifti1(good[:100])
    bad_magic = bytearray(good)
    bad_magic[344:348] = b"XXXX"
    with pytest.raises(ValueError, match="not a NIfTI-1"):
        parse_nifti1(bytes(bad_magic))
    bad_dt = bytearray(good)
    struct.pack_into("<h", bad_dt, 70, 64)  # DT_FLOAT64, unsupported
    with pytest.raises(ValueError, match="unsupported datatype"):
        parse_nifti1(bytes(bad_dt))
    short_data = good[:-1]
    with pytest.raises(ValueError, match="shorter"):
        parse_nifti1(short_data)
