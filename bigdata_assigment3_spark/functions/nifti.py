"""Hand-rolled NIfTI-1 container: 348-byte header writer + parser.

The reference exports segmented brain volumes with ``nib.save``
(reference `Hidden_MarkovModels/brain_segmentation.py:433-438`);
nibabel is absent from this sandbox, but the NIfTI-1 header is a fixed
348-byte little-endian struct (published spec: nifti1.h, NIH/NIMH,
public domain), so it is fully writable/parsable with ``struct`` +
``numpy`` alone — the same approach as this repo's DICOM Part-10
writer.  Single-file ``.nii`` layout: header (348 B) + extension
indicator (4 B zeros) + raw voxel data at ``vox_offset`` = 352.

Data ordering contract: NIfTI stores x fastest, then y, then z.  A
C-order ``(Z, Y, X)`` ndarray's ``tobytes()`` already has x fastest,
so ``dim = [3, X, Y, Z]`` + C-order bytes is the exact spec layout —
no transpose needed on either side.
"""

from __future__ import annotations

import struct

import numpy as np

SIZEOF_HDR = 348
VOX_OFFSET = 352.0  # header + 4-byte extension indicator
MAGIC = b"n+1\x00"  # single-file .nii

# NIfTI datatype codes (nifti1.h) for the dtypes this engine exports
DT_CODES = {
    np.dtype("int8"): (256, 8),  # DT_INT8
    np.dtype("uint8"): (2, 8),  # DT_UINT8
    np.dtype("int16"): (4, 16),  # DT_INT16
    np.dtype("float32"): (16, 32),  # DT_FLOAT32
}


def nifti1_bytes(
    arr: np.ndarray,
    pixdim_mm: tuple[float, float, float],
    descrip: str = "bigdata_assigment3_spark export",
) -> bytes:
    """Serialize a C-order ``(Z, Y, X)`` volume as a complete ``.nii``
    byte string (header + extension indicator + data).

    ``pixdim_mm`` is ``(dx, dy, dz)`` voxel spacing; the sform affine
    is the matching diagonal scaling (RAS+, origin at 0), qform is
    left disabled (qform_code=0) — the minimal-but-valid pattern
    nibabel itself writes for plain arrays.
    """
    if arr.ndim != 3:
        raise ValueError(f"expected (Z, Y, X) volume, got ndim={arr.ndim}")
    dtype = np.dtype(arr.dtype).newbyteorder("=")
    if dtype not in DT_CODES:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    dt_code, bitpix = DT_CODES[dtype]
    nz, ny, nx = arr.shape
    dx, dy, dz = pixdim_mm

    hdr = bytearray(SIZEOF_HDR)
    struct.pack_into("<i", hdr, 0, SIZEOF_HDR)  # sizeof_hdr
    hdr[38] = ord("r")  # regular (ANALYZE compat)
    struct.pack_into("<8h", hdr, 40, 3, nx, ny, nz, 1, 1, 1, 1)  # dim
    struct.pack_into("<h", hdr, 70, dt_code)  # datatype
    struct.pack_into("<h", hdr, 72, bitpix)  # bitpix
    # pixdim[0] is qfac (+1 by convention even with qform disabled)
    struct.pack_into("<8f", hdr, 76, 1.0, dx, dy, dz, 0.0, 0.0, 0.0, 0.0)
    struct.pack_into("<f", hdr, 108, VOX_OFFSET)  # vox_offset
    struct.pack_into("<2f", hdr, 112, 1.0, 0.0)  # scl_slope, scl_inter
    desc = descrip.encode()[:79]
    hdr[148 : 148 + len(desc)] = desc
    struct.pack_into("<2h", hdr, 252, 0, 1)  # qform_code=0, sform_code=1
    struct.pack_into("<4f", hdr, 280, dx, 0.0, 0.0, 0.0)  # srow_x
    struct.pack_into("<4f", hdr, 296, 0.0, dy, 0.0, 0.0)  # srow_y
    struct.pack_into("<4f", hdr, 312, 0.0, 0.0, dz, 0.0)  # srow_z
    hdr[344:348] = MAGIC
    return bytes(hdr) + b"\x00\x00\x00\x00" + np.ascontiguousarray(arr, dtype).tobytes()


def parse_nifti1(blob: bytes) -> tuple[dict, np.ndarray]:
    """Parse a single-file ``.nii`` byte string back into
    ``(header_fields, (Z, Y, X) ndarray)``, validating the invariants
    a reader must check (sizeof_hdr, magic, supported datatype, data
    length).  Everything returned is decoded FROM THE BYTES — callers
    use this to prove the round trip, so no field may be assumed."""
    if len(blob) < SIZEOF_HDR + 4:
        raise ValueError("truncated NIfTI file")
    (sizeof_hdr,) = struct.unpack_from("<i", blob, 0)
    magic = bytes(blob[344:348])
    if sizeof_hdr != SIZEOF_HDR or magic != MAGIC:
        raise ValueError(f"not a NIfTI-1 file (sizeof_hdr={sizeof_hdr}, magic={magic!r})")
    dim = struct.unpack_from("<8h", blob, 40)
    if dim[0] != 3:
        raise ValueError(f"expected 3-D volume, dim[0]={dim[0]}")
    nx, ny, nz = dim[1], dim[2], dim[3]
    (dt_code,) = struct.unpack_from("<h", blob, 70)
    (bitpix,) = struct.unpack_from("<h", blob, 72)
    by_code = {code: (np_dt, bits) for np_dt, (code, bits) in DT_CODES.items()}
    if dt_code not in by_code:
        raise ValueError(f"unsupported datatype code {dt_code}")
    np_dt, bits = by_code[dt_code]
    if bits != bitpix:
        raise ValueError(f"bitpix {bitpix} inconsistent with datatype {dt_code}")
    pixdim = struct.unpack_from("<8f", blob, 76)
    (vox_offset,) = struct.unpack_from("<f", blob, 108)
    scl_slope, scl_inter = struct.unpack_from("<2f", blob, 112)
    qform_code, sform_code = struct.unpack_from("<2h", blob, 252)
    srow = np.array(struct.unpack_from("<12f", blob, 280), dtype=np.float64).reshape(3, 4)
    off = int(vox_offset)
    n = nx * ny * nz
    if len(blob) - off < n * (bits // 8):
        raise ValueError("data segment shorter than dim[] promises")
    data = np.frombuffer(blob, dtype=np_dt, count=n, offset=off)
    fields = {
        "sizeof_hdr": sizeof_hdr,
        "dim": (nx, ny, nz),
        "datatype": dt_code,
        "bitpix": bitpix,
        "pixdim": pixdim[1:4],
        "vox_offset": off,
        "scl_slope": scl_slope,
        "scl_inter": scl_inter,
        "qform_code": qform_code,
        "sform_code": sform_code,
        "srow": srow,
        "magic": magic,
        "descrip": bytes(blob[148:228]).rstrip(b"\x00").decode(errors="replace"),
    }
    # x varies fastest in the file → C-order (Z, Y, X) reshape
    return fields, data.reshape(nz, ny, nx)
