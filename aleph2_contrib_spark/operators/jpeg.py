"""Pure-Python (stdlib-only) baseline JFIF JPEG codec.

Closes the codec family's last injected seam the same way PNG (r8) and
GIF (r9) did: the ENTROPY-CODED path is implemented here in full, no
PIL — canonical Huffman tables built from DHT per Annex C, a real
byte-stuffed bitstream reader/writer, per-component DC prediction,
dequantization, zigzag, 2-D IDCT and fixed-point YCbCr↔RGB. Reference
behavior parity target: the reference pipeline treats media as opaque
binary + typed metadata (`SURVEY.md §2` multimodal extras); this codec
makes the decode leg real for JPEG like `codecs.decode_png` did for PNG.

Scope (fail-fast on everything else, the PNG/GIF discipline):

- baseline sequential DCT (SOF0) only — progressive (SOF2), arithmetic
  coding, hierarchical modes raise;
- 8-bit precision, 1 (grayscale) or 3 (YCbCr 4:4:4) components — chroma
  subsampling raises (honest scope: the gate and tests cover what the
  code actually implements);
- no restart markers (DRI with nonzero interval raises).

Exactness contract the differential gate leans on: JPEG is lossy in
general, but a block-constant image encoded with a DC quantization step
of 8 round-trips EXACTLY — the DC coefficient of a constant 8×8 block is
8·(c−128) (orthonormal DCT), so step 8 quantizes it to the integer c−128
with zero loss, every AC is 0, and the fixed-point color transforms here
are exact identities on gray pixels (the luma weights sum to 65536 and
the chroma weights cancel, so Y=g, Cb=Cr=128 bit-for-bit). DuckDB can
therefore replay the decoded pixel arithmetic symbolically while the
Spark side runs the full marker walk + Huffman decode + IDCT on real
bytes. Arbitrary images are covered by pytest/hypothesis at the provable
error bound (quantization error ≤ 0.5 per coefficient × 64 basis terms
of magnitude ≤ 1/4 → ≤ 8 per pixel before the final rounding).

Public spec provenance: ITU-T T.81 (Annex C canonical Huffman, Annex F
bitstream, Annex K example tables), JFIF 1.02 (APP0, fixed-point color
transform weights).
"""

from __future__ import annotations

import math
import struct

JPEG_MIME = "image/jpeg"

# zigzag scan order: ZIGZAG[i] = raster index of the i-th scanned coeff
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K quantization tables (quality-50 reference tables), raster order
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


def dc_exact_quant(table: list[int]) -> list[int]:
    """A quant table whose DC step is 8 — the step that makes block-
    constant images round-trip exactly (see module docstring)."""
    out = list(table)
    out[0] = 8
    return out


# Annex K typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# separable DCT basis: _COS[u][x] = C(u)·cos((2x+1)uπ/16), C(0)=1/√2
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def _fdct_quant(block: list[int], quant: list[int]) -> list[int]:
    """Forward 2-D DCT of a level-shifted 8×8 block + quantization
    (floor(v/q + 0.5) — libjpeg's +half descale), zigzag order out."""
    # rows then columns (separable)
    tmp = [0.0] * 64
    for y in range(8):
        row = block[y * 8 : y * 8 + 8]
        for u in range(8):
            cu = _COS[u]
            tmp[y * 8 + u] = (
                row[0] * cu[0] + row[1] * cu[1] + row[2] * cu[2] + row[3] * cu[3]
                + row[4] * cu[4] + row[5] * cu[5] + row[6] * cu[6] + row[7] * cu[7]
            )
    out = [0] * 64
    for i in range(64):
        r = ZIGZAG[i]
        u, v = r % 8, r // 8
        cv = _COS[v]
        s = 0.0
        for y in range(8):
            s += tmp[y * 8 + u] * cv[y]
        out[i] = math.floor(0.25 * s / quant[r] + 0.5)
    return out


def _dequant_idct(coeffs: list[int], quant: list[int]) -> list[int]:
    """Dequantize zigzag-ordered coefficients + inverse 2-D DCT →
    level-shifted spatial block (floats rounded at the caller)."""
    dq = [0.0] * 64
    for i in range(64):
        if coeffs[i]:
            dq[ZIGZAG[i]] = coeffs[i] * quant[ZIGZAG[i]]
    # columns then rows (separable inverse)
    tmp = [0.0] * 64
    for u in range(8):
        col = [dq[v * 8 + u] for v in range(8)]
        if not any(col):
            continue
        for y in range(8):
            s = 0.0
            for v in range(8):
                if col[v]:
                    s += col[v] * _COS[v][y]
            tmp[y * 8 + u] = s
    out = [0] * 64
    for y in range(8):
        row = tmp[y * 8 : y * 8 + 8]
        for x in range(8):
            s = 0.0
            for u in range(8):
                if row[u]:
                    s += row[u] * _COS[u][x]
            out[y * 8 + x] = math.floor(0.25 * s + 128.0 + 0.5)
    return out


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Annex C canonical code construction: {(length, code): value}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_huffman(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Encoder-side view of the same canonical table: {value: (length, code)}."""
    return {v: lc for lc, v in _build_huffman(bits, vals).items()}


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (FF → FF 00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per F.1.2.3
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over byte-stuffed entropy data; raises on a
    non-RST marker inside the scan and on exhaustion."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data exhausted mid-scan")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG truncated after FF in scan")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"unexpected marker FF{nxt:02X} inside entropy scan"
                    )
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code (no match within 16 bits)")


def _extend(v: int, ssss: int) -> int:
    """F.2.2.1 EXTEND: map ssss received bits to a signed coefficient."""
    if ssss == 0:
        return 0
    if v < (1 << (ssss - 1)):
        return v - (1 << ssss) + 1
    return v


def _category(v: int) -> int:
    """Bit length of |v| (DC/AC magnitude category)."""
    return abs(v).bit_length()


def _rgb_to_ycbcr(rgb: bytes, n: int) -> tuple[list[int], list[int], list[int]]:
    """JFIF fixed-point color transform. The luma weights sum to 65536 and
    each chroma weight set cancels to 0, so gray pixels map EXACTLY to
    (Y=g, Cb=128, Cr=128) — the identity the differential gate relies on."""
    ys, cbs, crs = [0] * n, [0] * n, [0] * n
    for i in range(n):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        ys[i] = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
        cbs[i] = ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16) + 128
        crs[i] = ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16) + 128
    return ys, cbs, crs


def _ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """Inverse fixed-point transform; exact identity when cb == cr == 128."""
    cb -= 128
    cr -= 128
    r = y + ((91881 * cr + 32768) >> 16)
    g = y - ((22554 * cb + 46802 * cr + 32768) >> 16)
    b = y + ((116130 * cb + 32768) >> 16)
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


def _plane_blocks(plane: list[int], w: int, h: int):
    """Yield level-shifted 8×8 blocks in raster MCU order, edge-replicated
    past the right/bottom borders (A.2.4 sample expansion)."""
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = [0] * 64
            for yy in range(8):
                sy = min(by + yy, h - 1)
                row = sy * w
                for xx in range(8):
                    sx = min(bx + xx, w - 1)
                    block[yy * 8 + xx] = plane[row + sx] - 128
            yield block


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _dqt_segment(tq: int, table: list[int]) -> bytes:
    payload = bytes([tq]) + bytes(table[ZIGZAG[i]] for i in range(64))
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    quant_luma: list[int] | None = None,
    quant_chroma: list[int] | None = None,
    grayscale: bool = False,
) -> bytes:
    """Serialize raw interleaved RGB as a baseline JFIF JPEG (SOF0,
    YCbCr 4:4:4 or single-component grayscale, Annex K Huffman tables,
    real byte-stuffed entropy bitstream). Pass ``dc_exact_quant(...)``
    tables to make block-constant inputs round-trip exactly."""
    if width < 1 or height < 1:
        raise ValueError(f"bad dimensions {width}x{height}")
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"payload is {len(rgb)} bytes, need {width * height * 3} "
            f"for {width}x{height}"
        )
    ql = list(quant_luma or QUANT_LUMA)
    qc = list(quant_chroma or QUANT_CHROMA)
    for q in (ql, qc):
        if len(q) != 64 or any(not (1 <= v <= 255) for v in q):
            raise ValueError("quant tables must be 64 entries in [1, 255]")
    n = width * height
    ys, cbs, crs = _rgb_to_ycbcr(rgb, n)
    planes = [(ys, ql, 0)] if grayscale else [(ys, ql, 0), (cbs, qc, 1), (crs, qc, 1)]

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF 1.02, no thumbnail
    app0 = b"JFIF\x00" + bytes((1, 2, 0)) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    out += _dqt_segment(0, ql)
    if not grayscale:
        out += _dqt_segment(1, qc)
    ncomp = len(planes)
    sof = bytes((8,)) + struct.pack(">HH", height, width) + bytes((ncomp,))
    for ci in range(ncomp):
        sof += bytes((ci + 1, 0x11, planes[ci][2]))  # id, h=v=1 (4:4:4), tq
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not grayscale:
        out += _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    sos = bytes((ncomp,))
    for ci in range(ncomp):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes((ci + 1, td_ta))
    sos += bytes((0, 63, 0))  # Ss, Se, Ah/Al (baseline full scan)
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_enc_l = _encode_huffman(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_enc_l = _encode_huffman(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_enc_c = _encode_huffman(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_enc_c = _encode_huffman(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    writer = _BitWriter()
    preds = [0] * ncomp
    # 4:4:4 MCU = one block per component, interleaved in raster order
    block_iters = [
        _plane_blocks(planes[ci][0], width, height) for ci in range(ncomp)
    ]
    n_mcus = ((width + 7) // 8) * ((height + 7) // 8)
    for _ in range(n_mcus):
        for ci in range(ncomp):
            quant = planes[ci][1]
            dc_enc, ac_enc = (dc_enc_l, ac_enc_l) if ci == 0 else (dc_enc_c, ac_enc_c)
            coeffs = _fdct_quant(next(block_iters[ci]), quant)
            diff = coeffs[0] - preds[ci]
            preds[ci] = coeffs[0]
            ssss = _category(diff)
            if ssss > 11:
                raise ValueError(f"DC difference {diff} out of baseline range")
            length, code = dc_enc[ssss]
            writer.put(code, length)
            if ssss:
                writer.put(diff if diff > 0 else diff + (1 << ssss) - 1, ssss)
            run = 0
            for k in range(1, 64):
                v = coeffs[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = ac_enc[0xF0]  # ZRL
                    writer.put(code, length)
                    run -= 16
                s = _category(v)
                if s > 10:
                    raise ValueError(f"AC coefficient {v} out of baseline range")
                length, code = ac_enc[(run << 4) | s]
                writer.put(code, length)
                writer.put(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                length, code = ac_enc[0x00]  # EOB
                writer.put(code, length)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a baseline JFIF JPEG → (width, height, raw interleaved RGB).
    Real decode end-to-end: marker walk, DQT/DHT table loads (canonical
    Huffman per Annex C), SOF0 validation, byte-unstuffed entropy scan
    with per-component DC prediction, dequantize + inverse zigzag + 2-D
    IDCT, fixed-point YCbCr→RGB (grayscale expanded to RGB, the decoder
    family's contract). Progressive/arithmetic/subsampled/restart-
    interval streams fail fast."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError(f"bad JPEG SOI {payload[:2]!r}")
    pos = 2
    quants: dict[int, list[int]] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None  # (w, h, [(comp_id, tq)])
    scan = None   # ([(comp_idx, td, ta)], entropy_start)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got {payload[pos]:02X}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError(f"truncated JPEG segment FF{marker:02X}")
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                zz = seg[off + 1 : off + 65]
                if len(zz) != 64:
                    raise ValueError("truncated DQT table")
                table = [0] * 64
                for i in range(64):
                    table[ZIGZAG[i]] = zz[i]
                quants[tq] = table
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nvals])
                if len(bits) != 16 or len(vals) != nvals:
                    raise ValueError("truncated DHT table")
                (dc_tables if tc == 0 else ac_tables)[th] = _build_huffman(bits, vals)
                off += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError(f"only 8-bit precision supported, got {prec}")
            if ncomp not in (1, 3):
                raise ValueError(f"only 1/3-component JPEG supported, got {ncomp}")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    raise ValueError(
                        f"chroma subsampling not supported (h/v = {hv:02X})"
                    )
                comps.append((cid, tq))
            if w < 1 or h < 1:
                raise ValueError(f"bad JPEG dimensions {w}x{h}")
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline sequential DCT (SOF0) supported, got SOF FF{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            if struct.unpack(">H", seg)[0] != 0:
                raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if ns != len(frame[2]):
                raise ValueError("non-interleaved scans not supported")
            comps_in_scan = []
            by_id = {cid: i for i, (cid, _) in enumerate(frame[2])}
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si : 3 + 2 * si]
                if cs not in by_id:
                    raise ValueError(f"SOS references unknown component {cs}")
                comps_in_scan.append((by_id[cs], tdta >> 4, tdta & 0x0F))
            scan = (comps_in_scan, pos)
            break  # entropy data follows; decoded below
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = frame
    comps_in_scan, entropy_start = scan
    for _, tq in comps:
        if tq not in quants:
            raise ValueError(f"SOF references missing quant table {tq}")
    for _, td, ta in comps_in_scan:
        if td not in dc_tables or ta not in ac_tables:
            raise ValueError("SOS references missing Huffman table")
    reader = _BitReader(payload, entropy_start)
    bw, bh = (w + 7) // 8, (h + 7) // 8
    ncomp = len(comps)
    planes = [[0] * (bw * 8 * bh * 8) for _ in range(ncomp)]
    preds = [0] * ncomp
    for mcu in range(bw * bh):
        by, bx = divmod(mcu, bw)
        for comp_idx, td, ta in comps_in_scan:
            dc_t, ac_t = dc_tables[td], ac_tables[ta]
            quant = quants[comps[comp_idx][1]]
            coeffs = [0] * 64
            ssss = reader.decode(dc_t)
            diff = _extend(reader.bits(ssss), ssss) if ssss else 0
            preds[comp_idx] += diff
            coeffs[0] = preds[comp_idx]
            k = 1
            while k < 64:
                rs = reader.decode(ac_t)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("JPEG AC run past end of block")
                coeffs[k] = _extend(reader.bits(s), s)
                k += 1
            spatial = _dequant_idct(coeffs, quant)
            plane = planes[comp_idx]
            stride = bw * 8
            for yy in range(8):
                dst = (by * 8 + yy) * stride + bx * 8
                src = yy * 8
                plane[dst : dst + 8] = spatial[src : src + 8]
    out = bytearray(w * h * 3)
    stride = bw * 8
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
    for y in range(h):
        for x in range(w):
            i = y * stride + x
            dst = (y * w + x) * 3
            if ncomp == 1:
                g = clamp(planes[0][i])
                out[dst : dst + 3] = bytes((g, g, g))
            else:
                out[dst : dst + 3] = bytes(
                    _ycbcr_to_rgb(
                        clamp(planes[0][i]), clamp(planes[1][i]), clamp(planes[2][i])
                    )
                )
    return w, h, bytes(out)
