"""Pure numpy + stdlib image codecs for the decode-conformance check.

The sandbox has no PIL/imageio (SURVEY.md §7), so fixtures use two lossless
formats implementable from public specs with numpy + zlib alone:

- ``ppm``  — binary Netpbm P6, 8-bit RGB (spec: netpbm.sourceforge.net).
- ``png``  — minimal PNG: 8-bit RGB, non-interlaced, single IDAT, encoder
  writes filter type 0; the decoder implements all five standard filter
  types (None/Sub/Up/Average/Paeth) per the PNG spec (RFC 2083 / W3C).

Lossless formats ⇒ the per-row invariant is exact pixel equality; the
PSNR ≥ 40 dB path for lossy formats (BASELINE.json:15) activates only when a
real JPEG codec is importable — see ``decode_image``'s ``jpeg`` branch.

RAQC analog: a pixel being readable / not-nodata
(``[R] raqc/multi_array.py :: mask_basic (rec.)``); here "readable" means the
binary payload decodes and matches its declared ``w``/``h``/``fmt``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class DecodeError(ValueError):
    """Raised when an image payload cannot be decoded."""


# ---------------------------------------------------------------- PPM (P6)


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise DecodeError("not a P6 PPM")
    # Parse the three header tokens (w, h, maxval), skipping whitespace/comments.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise DecodeError("truncated PPM header")
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError as e:
        raise DecodeError(f"bad PPM header: {e}") from e
    if maxval != 255 or w <= 0 or h <= 0:
        raise DecodeError(f"unsupported PPM (w={w} h={h} maxval={maxval})")
    need = w * h * 3
    body = data[pos : pos + need]
    if len(body) != need:
        raise DecodeError(f"truncated PPM body: {len(body)} != {need}")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


# ------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as 8-bit RGB PNG (filter 0)."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    # filter byte 0 prepended to each scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. raw is (h, 1+stride) uint8 (filter byte first)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pcc) else (b if pb <= pcc else cc)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise DecodeError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise DecodeError("bad PNG signature")
    pos, w = len(_PNG_SIG), None
    h = bit_depth = color_type = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise DecodeError("truncated PNG chunk")
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) != 4 or struct.unpack(">I", crc)[0] != (
            zlib.crc32(tag + payload) & 0xFFFFFFFF
        ):
            raise DecodeError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8 or color_type != 2 or interlace != 0:
                raise DecodeError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise DecodeError("missing IHDR/IDAT")
    try:
        decomp = zlib.decompress(idat)
    except zlib.error as e:
        raise DecodeError(f"IDAT inflate failed: {e}") from e
    stride = w * 3
    if len(decomp) != h * (1 + stride):
        raise DecodeError("bad PNG payload size")
    raw = np.frombuffer(decomp, dtype=np.uint8).reshape(h, 1 + stride)
    if np.all(raw[:, 0] == 0):  # fast path: all filter-0 scanlines (our encoder)
        return raw[:, 1:].reshape(h, w, 3).copy()
    return _unfilter(raw, h, stride, 3).reshape(h, w, 3)


# --------------------------------------------------------------- dispatch


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "ppm":
        return encode_ppm(arr)
    if fmt == "png":
        return encode_png(arr)
    if fmt == "jpeg":
        # quality 98 keeps synth-fixture round trips comfortably above the
        # PSNR ≥ 40 dB invariant (measured worst case 43.6 dB)
        from .jpeg import encode_jpeg

        return encode_jpeg(arr, quality=98)
    raise ValueError(f"no encoder for fmt={fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode bytes per declared fmt → (h, w, 3) uint8. Raises DecodeError."""
    if data is None:
        raise DecodeError("null bytes")
    if fmt == "ppm":
        return decode_ppm(bytes(data))
    if fmt == "png":
        return decode_png(bytes(data))
    if fmt == "jpeg":
        # Lossy path (PSNR >= 40 dB invariant): prefer a real C codec
        # where importable; otherwise the vendored pure-python baseline
        # decoder (jpeg.py, public T.81/JFIF spec) handles it.
        try:
            from PIL import Image  # type: ignore
            import io

            return np.asarray(Image.open(io.BytesIO(bytes(data))).convert("RGB"))
        except ImportError:
            from .jpeg import decode_jpeg

            return decode_jpeg(bytes(data))
    raise DecodeError(f"unknown fmt {fmt!r}")


# ----------------------------------------------------------------- phash


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual-hash surrogate: 8×8 block-mean luma grid, bit i set
    iff cell i > median of the grid (FIXTURES.md §1). Returns signed int64."""
    luma = (
        0.299 * arr[:, :, 0].astype(np.float64)
        + 0.587 * arr[:, :, 1]
        + 0.114 * arr[:, :, 2]
    )
    h, w = luma.shape
    # Block-mean resize to 8×8 via bin edges (handles non-divisible dims).
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    if h >= 8 and w >= 8:
        row_sums = np.add.reduceat(luma, ys[:8], axis=0)
        grid = np.add.reduceat(row_sums, xs[:8], axis=1)
        grid /= np.outer(np.diff(ys), np.diff(xs))
    else:
        grid = np.empty((8, 8), dtype=np.float64)
        for i in range(8):
            for j in range(8):
                grid[i, j] = luma[ys[i] : max(ys[i + 1], ys[i] + 1),
                                  xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    med = np.median(grid)
    bits = (grid.ravel() > med).astype(np.uint64)
    val = np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64))
    return int(val.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((int(a) & 0xFFFFFFFFFFFFFFFF) ^ (int(b) & 0xFFFFFFFFFFFFFFFF)).count("1")


def synth_image(rng: np.random.Generator, w: int, h: int, brightness: int = 0) -> np.ndarray:
    """Deterministic gradient + per-image coarse pattern + noise RGB image
    (FIXTURES.md §1).  The coarse 8×8 random field (upsampled) gives each
    image a distinctive phash — without it, every gradient image would
    share nearly the same 8×8 luma grid and all phashes would collide."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.empty((h, w, 3), dtype=np.float64)
    base[:, :, 0] = 255.0 * xx / max(w - 1, 1)
    base[:, :, 1] = 255.0 * yy / max(h - 1, 1)
    base[:, :, 2] = 255.0 * (xx + yy) / max(w + h - 2, 1)
    coarse = rng.uniform(-90.0, 90.0, size=(8, 8, 3))
    ry = int(np.ceil(h / 8))
    rx = int(np.ceil(w / 8))
    coarse_up = np.repeat(np.repeat(coarse, ry, axis=0), rx, axis=1)[:h, :w, :]
    noise = rng.normal(0.0, 12.0, size=(h, w, 3))
    return np.clip(0.5 * base + 64.0 + coarse_up + noise + brightness, 0, 255).astype(
        np.uint8
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def dhash64(arr: np.ndarray) -> int:
    """64-bit DIFFERENCE hash (gradient hash): 8×9 block-mean luma
    grid, bit (r, c) set iff cell (r, c+1) > cell (r, c).  The
    classic dHash — complementary to :func:`phash64`'s median
    threshold: comparing ADJACENT cells makes it invariant to uniform
    brightness/contrast shifts (differences are unchanged where the
    8-bit clip does not engage), while phash's global median moves
    with any luminance change.  Returns signed int64."""
    luma = (
        0.299 * arr[:, :, 0].astype(np.float64)
        + 0.587 * arr[:, :, 1]
        + 0.114 * arr[:, :, 2]
    )
    h, w = luma.shape
    gh, gw = 8, 9
    ys = (np.arange(gh + 1) * h) // gh
    xs = (np.arange(gw + 1) * w) // gw
    if h >= gh and w >= gw:
        rows = np.add.reduceat(luma, ys[:gh], axis=0)
        grid = np.add.reduceat(rows, xs[:gw], axis=1)
        grid /= np.outer(np.diff(ys), np.diff(xs))
    else:
        grid = np.empty((gh, gw), dtype=np.float64)
        for i in range(gh):
            for j in range(gw):
                grid[i, j] = luma[ys[i]: max(ys[i + 1], ys[i] + 1),
                                  xs[j]: max(xs[j + 1], xs[j] + 1)].mean()
    bits = (grid[:, 1:] > grid[:, :-1]).ravel().astype(np.uint64)
    val = np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64))
    return int(val.astype(np.int64))
