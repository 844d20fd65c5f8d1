"""Pure numpy/stdlib baseline JPEG codec (ITU-T T.81 / JFIF, public spec).

Activates the lossy-format path of the decode-conformance check
(BASELINE.json "decoded pixels verified allclose, PSNR≥40dB for lossy
fmt"): the sandbox has no libjpeg/PIL, so both sides are implemented
from the public spec with numpy for the DCT math and plain Python only
at the (entropy-coded) bit level.

Scope — baseline sequential DCT, 8-bit, Huffman, 4:4:4 (no chroma
subsampling), single interleaved scan, no restart markers:

- encoder: JFIF container (SOI APP0 DQT SOF0 DHT SOS … EOI), Annex-K
  quantization tables scaled by the IJG quality curve, Annex-K Huffman
  tables; DCT via one einsum over all 8×8 blocks.
- decoder: parses DQT/DHT/SOF0/SOS from the STREAM (self-describing —
  any conformant baseline 4:4:4/grayscale file decodes, not just ours),
  canonical Huffman decode, vectorized dequant + IDCT + color convert.

The entropy coder is O(coefficients) interpreted Python — fine for the
fixture-scale images the conformance check decodes; production columns
at 100-TB scale use the lossless formats (codecs.py) or an external
codec where available (codecs.decode_image prefers PIL when importable).
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import DecodeError

# ---------------------------------------------------------------- tables

# Annex K.1/K.2 quantization tables (zigzag-free, row-major)
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3 Huffman specifications: (bits[1..16], values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))


_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])

# orthonormal 8×8 DCT-II matrix
_T = np.zeros((8, 8))
for _i in range(8):
    for _j in range(8):
        a = np.sqrt(1 / 8) if _i == 0 else np.sqrt(2 / 8)
        _T[_i, _j] = a * np.cos((2 * _j + 1) * _i * np.pi / 16)


def _canonical_codes(bits, values):
    """(bits, values) → {symbol: (code, length)} (T.81 Annex C)."""
    codes, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, values):
    """(bits, values) → {(length, code): symbol}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size, bits) per T.81 F.1.2.1 (F.12 extend inverse)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float → (n_blocks, 8, 8), row-major block order, H/W already
    padded to multiples of 8."""
    H, W = plane.shape
    return (plane.reshape(H // 8, 8, W // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def encode_jpeg(arr: np.ndarray, quality: int = 92) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (4:4:4)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    # RGB → YCbCr (JFIF / BT.601)
    f = arr.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128
    # pad to multiple of 8 by edge replication
    ph, pw = -h % 8, -w % 8
    planes = [np.pad(p, ((0, ph), (0, pw)), mode="edge") for p in (y, cb, cr)]
    qy, qc = _quality_scale(_QY, quality), _quality_scale(_QC, quality)
    qtabs = [qy, qc, qc]
    dc_codes = [_canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHR),
                _canonical_codes(*_DC_CHR)]
    ac_codes = [_canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHR),
                _canonical_codes(*_AC_CHR)]

    # DCT + quantize + zigzag, vectorized per component
    comp_zz = []
    for p, qt in zip(planes, qtabs):
        blocks = _blocks_of(p - 128.0)
        coeff = np.einsum("ij,njk,lk->nil", _T, blocks, _T)
        quant = np.round(coeff / qt.reshape(8, 8)).astype(np.int64)
        comp_zz.append(quant.reshape(-1, 64)[:, ZIGZAG])

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    n_mcu = comp_zz[0].shape[0]
    for m in range(n_mcu):
        for c in range(3):
            zz = comp_zz[c][m]
            dc, ac_tab = dc_codes[c], ac_codes[c]
            diff = int(zz[0]) - prev_dc[c]
            prev_dc[c] = int(zz[0])
            size, bits = _magnitude(diff)
            code, length = dc[size]
            bw.write(code, length)
            bw.write(bits, size)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_tab[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_tab[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if last < 63:
                code, length = ac_tab[0x00]  # EOB
                bw.write(code, length)
    scan = bw.flush()

    # ---- container
    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)  # APP0
    for tid, qt in ((0, qy), (1, qc)):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid]) + \
            bytes(int(qt[z]) for z in ZIGZAG)
    # SOF0: 8-bit, 3 components, all 1×1 sampling
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])
    for tc_th, (bits, vals) in (((0, 0), _DC_LUM), ((0, 1), _DC_CHR),
                                ((1, 0), _AC_LUM), ((1, 1), _AC_CHR)):
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals)) + \
            bytes([(tc_th[0] << 4) | tc_th[1]]) + bytes(bits) + bytes(vals)
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tdta])
    out += bytes([0, 63, 0])  # Ss, Se, Ah/Al
    out += scan
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first reader over the entropy-coded segment (unstuffed)."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise DecodeError("jpeg: truncated entropy segment")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise DecodeError("jpeg: truncated entropy segment")
        chunk = self.bits[self.pos : self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def read_huffman(self, table: dict) -> int:
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise DecodeError("jpeg: invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    """T.81 F.12: magnitude bits → signed value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB.

    Supports baseline sequential DCT, 8-bit, Huffman, 1 or 3 components,
    1×1 sampling (4:4:4), single interleaved scan, optional restart
    markers.  Anything else raises DecodeError (progressive, subsampled,
    arithmetic, 12-bit)."""
    if not data.startswith(b"\xFF\xD8"):
        raise DecodeError("jpeg: missing SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = 0
    comps: list[tuple[int, int]] = []  # (component_id, quant table id)
    scan_comps: list[tuple[int, int, int]] = []  # (cid, dc table, ac table)
    restart_interval = 0
    scan_start = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise DecodeError("jpeg: bad marker alignment")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are standalone markers with no length segment
            continue
        if pos + 2 > len(data):
            raise DecodeError("jpeg: truncated marker segment")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise DecodeError("jpeg: 16-bit quant tables unsupported")
                zz = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8
                                   ).astype(np.int32)
                tab = np.zeros(64, dtype=np.int32)
                tab[ZIGZAG] = zz
                qtabs[tq] = tab.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nval = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nval])
                huff[(tc, th)] = _decode_table(bits, vals)
                p += 17 + nval
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            p = 6
            for _ in range(nc):
                cid, sampling, tq = seg[p], seg[p + 1], seg[p + 2]
                if sampling != 0x11:
                    raise DecodeError("jpeg: subsampling unsupported")
                comps.append((cid, tq))
                p += 3
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise DecodeError("jpeg: only baseline SOF0 supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            p = 1
            for _ in range(ns):
                cid, t = seg[p], seg[p + 1]
                scan_comps.append((cid, t >> 4, t & 0xF))
                p += 2
            scan_start = pos + seglen
            break
        pos += seglen
    if scan_start is None or not comps:
        raise DecodeError("jpeg: no scan found")
    if len(comps) not in (1, 3) or len(scan_comps) != len(comps):
        raise DecodeError("jpeg: component layout unsupported")

    # entropy-coded segment: up to EOI, unstuff 0xFF00, note RST markers
    end = data.rfind(b"\xFF\xD9")
    if end < 0:
        end = len(data)
    raw = data[scan_start:end]
    segments = []
    cur = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0xFF and i + 1 < len(raw):
            nxt = raw[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: reset DC predictors
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    nbx, nby = (w + 7) // 8, (h + 7) // 8
    n_mcu = nbx * nby
    ncomp = len(comps)
    coeffs = np.zeros((ncomp, n_mcu, 64), dtype=np.float64)
    cid_order = [c for c, _, _ in scan_comps]
    comp_q = {cid: qtabs[tq] for cid, tq in comps}
    if any(cid not in comp_q for cid in cid_order):
        raise DecodeError("jpeg: scan references unknown component")

    mcu = 0
    prev_dc = {cid: 0 for cid in cid_order}
    for seg_bytes in segments:
        if mcu >= n_mcu:
            break
        br = _BitReader(seg_bytes)
        limit = (mcu + restart_interval) if restart_interval else n_mcu
        try:
            while mcu < min(limit, n_mcu):
                for ci, (cid, tdc, tac) in enumerate(scan_comps):
                    dct = huff.get((0, tdc))
                    act = huff.get((1, tac))
                    if dct is None or act is None:
                        raise DecodeError("jpeg: missing Huffman table")
                    size = br.read_huffman(dct)
                    diff = _extend(br.read_bits(size), size)
                    prev_dc[cid] += diff
                    zz = coeffs[ci, mcu]
                    zz[0] = prev_dc[cid]
                    k = 1
                    while k < 64:
                        rs = br.read_huffman(act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise DecodeError("jpeg: AC index overflow")
                        zz[k] = _extend(br.read_bits(s), s)
                        k += 1
                mcu += 1
        except DecodeError:
            if mcu == 0:
                raise
            break  # tolerate padding after last full MCU
        prev_dc = prev_dc if restart_interval == 0 else \
            {cid: 0 for cid in cid_order}
    if mcu < n_mcu:
        raise DecodeError(f"jpeg: decoded {mcu}/{n_mcu} MCUs")

    # dequantize + dezigzag + IDCT, vectorized per component
    planes = []
    for ci, cid in enumerate(cid_order):
        qt = comp_q[cid].astype(np.float64)
        blocks64 = np.zeros((n_mcu, 64))
        blocks64[:, ZIGZAG] = coeffs[ci]
        blocks = blocks64.reshape(-1, 8, 8) * qt
        pix = np.einsum("ji,njk,kl->nil", _T, blocks, _T) + 128.0
        plane = (pix.reshape(nby, nbx, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))
        planes.append(plane[:h, :w])
    if ncomp == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
