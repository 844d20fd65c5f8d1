"""DC-only JPEG decode — the classic partial-decode triage path
(ITU-T T.81 §F.2; the trick behind fast thumbnailers like libjpeg's
``scale_denom=8``): every 8x8 block's MEAN is fully determined by its
quantized DC coefficient (the AC basis functions of the orthonormal
DCT are zero-mean), so brightness statistics need none of the
dequant-IDCT-colorconvert work and never materialize full-resolution
pixels — at 100-TB image scale that is the difference between a
triage scan and a decode of the whole corpus.

Shares the entropy primitives of the full codec
(:mod:`raqc_ray.jpeg`: canonical Huffman tables, bit reader, EXTEND)
but walks the scan differently: AC codes are Huffman-read and their
magnitude bits SKIPPED (the stream is serial — you cannot seek past
them — but nothing is stored, dezigzagged, or transformed), only the
per-block DC predictor chain is kept, and one vectorized epilogue
maps it to block means ``dc * q00 / 8 + 128``.  With this pure-python
codec the saving is the coefficient store + numpy IDCT + pixel
materialization; with a native codec the same contract also skips
the (dominant) IDCT FLOPs — the CONTRACT, a (nby, nbx) float64 grid
of luma block means, is codec-independent.

Supports exactly what :func:`raqc_ray.jpeg.decode_jpeg` supports
(baseline sequential, 8-bit, 4:4:4, optional restarts); the luma
grid is component 0 of the scan (Y for 3-component YCbCr, the sole
plane for grayscale).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import DecodeError, _BitReader, _decode_table, _extend

__all__ = ["decode_jpeg_dc"]


def decode_jpeg_dc(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (nby, nbx) float64 luma BLOCK MEANS,
    unclipped (a block mean may exit [0, 255] when the source pixels
    clipped; callers clip if they need display values)."""
    if not data.startswith(b"\xFF\xD8"):
        raise DecodeError("jpeg: missing SOI")
    pos = 2
    q00: dict[int, int] = {}          # quant table id -> DC step
    huff: dict[tuple[int, int], dict] = {}
    h = w = 0
    comps: list[tuple[int, int]] = []
    scan_comps: list[tuple[int, int, int]] = []
    restart_interval = 0
    scan_start = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise DecodeError("jpeg: bad marker alignment")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise DecodeError("jpeg: truncated marker segment")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT — only the DC step matters here
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise DecodeError("jpeg: 16-bit quant tables "
                                      "unsupported")
                # zigzag stream position 0 IS the DC step (ZIGZAG[0]=0)
                q00[tq] = int(seg[p + 1])
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nval = sum(bits)
                huff[(tc, th)] = _decode_table(
                    bits, list(seg[p + 17:p + 17 + nval]))
                p += 17 + nval
        elif marker == 0xC0:  # SOF0
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            p = 6
            for _ in range(nc):
                cid, sampling, tq = seg[p], seg[p + 1], seg[p + 2]
                if sampling != 0x11:
                    raise DecodeError("jpeg: subsampling unsupported")
                comps.append((cid, tq))
                p += 3
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise DecodeError("jpeg: only baseline SOF0 supported")
        elif marker == 0xDD:
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

    end = data.rfind(b"\xFF\xD9")
    if end < 0:
        end = len(data)
    raw = data[scan_start:end]
    segments: list[bytes] = []
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
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    nbx, nby = (w + 7) // 8, (h + 7) // 8
    n_mcu = nbx * nby
    luma_cid = scan_comps[0][0]
    comp_q = dict(comps)
    if any(cid not in comp_q for cid, _, _ in scan_comps):
        raise DecodeError("jpeg: scan references unknown component")
    dc_y = np.zeros(n_mcu, dtype=np.int64)

    mcu = 0
    prev_dc = {cid: 0 for cid, _, _ in scan_comps}
    for seg_bytes in segments:
        if mcu >= n_mcu:
            break
        br = _BitReader(seg_bytes)
        limit = (mcu + restart_interval) if restart_interval else n_mcu
        try:
            while mcu < min(limit, n_mcu):
                for cid, tdc, tac in scan_comps:
                    dct = huff.get((0, tdc))
                    act = huff.get((1, tac))
                    if dct is None or act is None:
                        raise DecodeError("jpeg: missing Huffman table")
                    size = br.read_huffman(dct)
                    prev_dc[cid] += _extend(br.read_bits(size), size)
                    if cid == luma_cid:
                        dc_y[mcu] = prev_dc[cid]
                    # AC: decode run/size symbols, SKIP magnitude bits
                    k = 1
                    while k < 64:
                        rs = br.read_huffman(act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break
                        k += r + 1
                        if k > 64:
                            raise DecodeError("jpeg: AC index overflow")
                        br.read_bits(s)
                mcu += 1
        except DecodeError:
            if mcu == 0:
                raise
            break
        prev_dc = prev_dc if restart_interval == 0 else \
            {cid: 0 for cid, _, _ in scan_comps}
    if mcu < n_mcu:
        raise DecodeError(f"jpeg: decoded {mcu}/{n_mcu} MCUs")

    # block mean of the orthonormal IDCT's DC term: dc*q00/8 + 128
    qstep = float(q00[comp_q[luma_cid]])
    means = dc_y.astype(np.float64) * (qstep / 8.0) + 128.0
    return means.reshape(nby, nbx)
