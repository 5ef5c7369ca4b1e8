"""Pure-stdlib baseline JPEG codec (grayscale, sequential DCT).

The reference decodes arbitrary rasters via ``cv2.imdecode``
(reference `HOUGH Transform/hough_heart_detector.py:36-40`); with no
image library in this sandbox, the baseline JPEG process is
implemented directly from the published spec (ITU-T T.81 / ISO 10918):
marker segmentation (SOI/APP0/DQT/SOF0/DHT/SOS/EOI), the Annex-K
example luminance quantization + Huffman tables, zigzag ordering, DC
prediction, (run, size) AC run-length coding, byte stuffing, and the
orthonormal 8x8 DCT-II pair via numpy matrix products.

Scope (honest gate, raised as ValueError): single-component
(grayscale) baseline only — no progressive, no restart markers, no
chroma subsampling.  JPEG is lossy in general, but two classes survive
the pipeline bit-exactly and carry the value oracles:

- 8x8 block-constant images whose (value - 128) is even: AC
  coefficients are exactly zero and DC quantizes without remainder at
  the Annex-K DC step of 16 (the original DC-lossless class).
- at quality 100 (all-ones quantization table), any image whose
  per-block DCT support lies on the {0,4}x{0,4} frequency lattice:
  the k=0 and k=4 orthonormal basis rows both have entry magnitude
  sqrt(2)/4, so every basis PRODUCT is exactly +-1/8 and the IDCT is
  integer arithmetic over 8 — the decoder takes an exact integer
  path for such blocks (no float trig at all).  Pixel-domain form:
  a + b*sig(x) + c*sig(y) + d*sig(x)*sig(y) with sig the k=4 sign
  pattern (+,-,-,+,+,-,-,+) — genuinely textured content.

General-content fidelity is covered by PSNR unit tests.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 — example luminance quantization table
QTABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# ITU-T T.81 Annex K.3 — typical luminance Huffman tables (BITS, HUFFVAL)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
assert sum(DC_BITS) == len(DC_VALS) and sum(AC_BITS) == len(AC_VALS)


def _zigzag() -> np.ndarray:
    """(row, col) visit order of the spec's zigzag scan, generated
    rather than recalled: anti-diagonal s runs row-ascending when s is
    odd, row-descending when even."""
    order = []
    for s in range(15):
        cells = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        order.extend(cells if s % 2 else reversed(cells))
    return np.array(order)


ZZ = _zigzag()
ZZ_FLAT = ZZ[:, 0] * 8 + ZZ[:, 1]  # flat index per zigzag position

# Orthonormal DCT-II matrix: forward C = M @ B @ M.T, inverse B = M.T @ C @ M
_N = np.arange(8)
DCT_M = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16) * 0.5
DCT_M[0, :] = np.sqrt(1.0 / 8.0)

# quality-100 table: quantization is the identity, so the only loss
# left is round(DCT) — zero on the {0,4}x{0,4} lattice class below
QTABLE_Q100 = np.ones((8, 8), dtype=np.int32)

# sign pattern of the k=4 basis row: cos((2n+1)*pi/4) = (sqrt2/2)*SIG44[n]
SIG44 = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)
# True outside the {0,4}x{0,4} lattice — a dequantized block with no
# energy there has an EXACT integer IDCT (all basis products +-1/8)
_OFF_LATTICE = np.ones((8, 8), dtype=bool)
_OFF_LATTICE[np.ix_([0, 4], [0, 4])] = False


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the spec's canonical assignment."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


DC_CODES = _build_codes(DC_BITS, DC_VALS)
AC_CODES = _build_codes(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def jpeg_encode_gray(arr: np.ndarray, qtable: np.ndarray | None = None) -> bytes:
    """Encode a uint8 (H, W) array as a baseline grayscale JFIF/JPEG.

    ``qtable`` defaults to the Annex-K luminance table; pass
    :data:`QTABLE_Q100` for quality-100 (identity quantization)."""
    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise ValueError(f"expected uint8 (H, W), got {arr.dtype} {arr.shape}")
    qt = QTABLE if qtable is None else np.asarray(qtable, dtype=np.int32)
    if qt.shape != (8, 8) or qt.min() < 1 or qt.max() > 255:
        raise ValueError("quantization table must be 8x8 with entries in 1..255")
    h, w = arr.shape
    ph, pw = -h % 8, -w % 8  # edge-replicate to block multiples
    padded = np.pad(arr, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0

    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, h + ph, 8):
        for bx in range(0, w + pw, 8):
            block = padded[by : by + 8, bx : bx + 8]
            coef = DCT_M @ block @ DCT_M.T
            q = np.round(coef / qt).astype(np.int64)
            zz = q.reshape(-1)[ZZ_FLAT]
            # DC: differential, category + extra bits
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            t = _category(diff)
            bw.write(*DC_CODES[t])
            if t:
                bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
            # AC: (run, size) with ZRL and EOB
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = int(nz[-1]) + 1 if nz.size else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.write(*AC_CODES[0xF0])  # ZRL
                    run -= 16
                s = _category(v)
                bw.write(*AC_CODES[(run << 4) | s])
                bw.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last < 63:
                bw.write(*AC_CODES[0x00])  # EOB

    qzz = qt.reshape(-1)[ZZ_FLAT].astype(np.uint8).tobytes()
    dht_dc = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    return (
        b"\xff\xd8"  # SOI
        + _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _seg(0xFFDB, b"\x00" + qzz)  # DQT, table 0, 8-bit
        + _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")  # SOF0
        + _seg(0xFFC4, dht_dc)
        + _seg(0xFFC4, dht_ac)
        + _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
        + bw.flush()
        + b"\xff\xd9"  # EOI
    )


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("entropy stream exhausted before all blocks decoded")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                raise ValueError("unexpected marker inside entropy stream")
            self.pos += 1  # consume the stuffed 0x00
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode_gray(blob: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to a uint8 (H, W) array,
    validating marker structure, table presence, and the supported-
    process envelope (raises ValueError outside it)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    hufftables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    dims = comp = None
    scan_start = None
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        (length,) = struct.unpack_from(">H", blob, pos)
        payload = blob[pos + 2 : pos + length]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                tbl = np.zeros(64, np.int32)
                tbl[ZZ_FLAT] = np.frombuffer(payload, np.uint8, 64, p + 1)
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"only baseline (SOF0) supported, got SOF marker {marker:#x}")
        elif marker == 0xC0:  # SOF0
            prec, h, w, nf = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nf != 1:
                raise ValueError("only single-component (grayscale) supported")
            if payload[7] != 0x11:
                raise ValueError("subsampling not supported for grayscale")
            dims, comp = (h, w), payload[8]  # quant table id
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                hufftables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            if ns != 1:
                raise ValueError("only single-scan grayscale supported")
            td, ta = payload[2] >> 4, payload[2] & 0xF
            scan_start = pos + length
            break
        pos += length
    if dims is None or scan_start is None:
        raise ValueError("missing SOF0 or SOS")
    if comp not in qtables or (0, td) not in hufftables or (1, ta) not in hufftables:
        raise ValueError("missing quantization or Huffman table")
    h, w = dims
    qt_i = qtables[comp].astype(np.int64)
    dc_tbl, ac_tbl = hufftables[(0, td)], hufftables[(1, ta)]

    # entropy segment ends at the next real marker (EOI)
    end = blob.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    br = _BitReader(blob[scan_start:end])

    bh, bw_ = -(-h // 8), -(-w // 8)
    out = np.zeros((bh * 8, bw_ * 8), np.float64)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw_):
            zz = np.zeros(64, np.int64)
            t = _huff_decode(br, dc_tbl)
            diff = _extend(br.read_bits(t), t) if t else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = _huff_decode(br, ac_tbl)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = rs >> 4, rs & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC run overruns block")
                zz[k] = _extend(br.read_bits(size), size)
                k += 1
            coef = np.zeros(64, np.int64)
            coef[ZZ_FLAT] = zz
            deq = coef.reshape(8, 8) * qt_i
            if not deq[_OFF_LATTICE].any():
                # exact integer IDCT: every {0,4}x{0,4} basis product
                # is +-1/8 exactly, so no trig enters at all — this is
                # what makes the DC-constant AND quality-100 lattice
                # fixture classes pixel-exact by construction, not by
                # float luck.  num/8.0 is exact in float64 (|num| well
                # under 2^53), so the shared final round is unchanged.
                num = (
                    deq[0, 0]
                    + deq[0, 4] * SIG44[None, :]
                    + deq[4, 0] * SIG44[:, None]
                    + deq[4, 4] * SIG44[:, None] * SIG44[None, :]
                )
                block = num / 8.0
            else:
                block = DCT_M.T @ deq.astype(np.float64) @ DCT_M
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)[:h, :w]
