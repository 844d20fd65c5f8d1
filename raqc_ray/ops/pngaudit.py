"""PNG structural audit WITHOUT full decode — the cheap triage stage
that walks the chunk stream of each blob and verifies container-level
invariants: signature, chunk framing (declared lengths consistent with
the byte stream, IHDR first, IEND terminal) and per-chunk CRC32.  Bit
rot and truncation in an object store show up here for the cost of a
CRC pass — three orders of magnitude cheaper than inflate+unfilter —
so the full-decode pool (`DecodeCheck`, `ExposureStage`, …) only runs
on blobs that pass.  JPEG sibling: `ops/dcstats` (DC-only partial
decode).

Per image (``ok=true`` rows — structurally parseable):

- ``w / h / bit_depth / color_type`` from IHDR
- ``n_chunks``     chunks walked up to and including IEND
- ``idat_bytes``   total compressed payload across IDAT chunks
- ``crc_fail``     chunks whose stored CRC32 mismatches (CORRUPTION
                   CENSUS — a nonzero count is the audit finding, not
                   a parse failure)

``ok=false`` degradation (bad signature, truncated/overrun framing,
missing IHDR/IEND) carries the error string, per the engine's per-row
error contract.

Stateful actor-pool stage (SURVEY §2.3 ST4 shape): zero-copy Arrow
byte slices; the walk is a few `struct` reads + one `zlib.crc32` per
chunk (C speed) — no Python per-pixel work, no decompression.  All
outputs exact int64; embarrassingly parallel, no shuffle.

Gates: planted-corruption unit tests (`test_pngaudit`) and the
end-to-end driver oracle `q175_pngaudit_documents` — variable-size
renders with deterministically CRC-flipped IDAT chunks vs a
closed-form SQL oracle.
"""

from __future__ import annotations

import struct
import zlib

import pyarrow as pa

from ..arrow_util import binary_row_accessor

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("w", pa.int64()),
    pa.field("h", pa.int64()),
    pa.field("bit_depth", pa.int64()),
    pa.field("color_type", pa.int64()),
    pa.field("n_chunks", pa.int64()),
    pa.field("idat_bytes", pa.int64()),
    pa.field("crc_fail", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


def png_audit_of(data: bytes) -> tuple[int, int, int, int, int, int, int]:
    """(w, h, bit_depth, color_type, n_chunks, idat_bytes, crc_fail)
    of one PNG byte string; raises ValueError on structural damage
    (CRC mismatches are counted, not raised)."""
    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos, n = 8, len(data)
    n_chunks = idat_bytes = crc_fail = 0
    w = h = bit_depth = color_type = -1
    seen_end = False
    while pos < n:
        if pos + 8 > n:
            raise ValueError(f"truncated chunk header at {pos}")
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            raise ValueError(f"chunk {tag!r} overruns stream")
        payload = data[pos + 8:end]
        (crc,) = struct.unpack_from(">I", data, end)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            crc_fail += 1
        n_chunks += 1
        if n_chunks == 1:
            if tag != b"IHDR" or length != 13:
                raise ValueError("first chunk is not a valid IHDR")
            w, h, bit_depth, color_type = struct.unpack_from(
                ">IIBB", payload)
        elif tag == b"IDAT":
            idat_bytes += length
        elif tag == b"IEND":
            seen_end = True
            break
        pos = end + 4
    if n_chunks == 0 or w < 0:
        raise ValueError("no chunks")
    if not seen_end:
        raise ValueError("missing IEND")
    return (w, h, bit_depth, color_type, n_chunks, idat_bytes, crc_fail)


class PngAuditStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, bytes_col: str = "bytes",
                 id_col: str = "image_id"):
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("w", "h", "bit_depth", "color_type", "n_chunks",
                "idat_bytes", "crc_fail", "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i in range(len(ids)):
            try:
                row = (*png_audit_of(bytes(row_bytes(i))), True, None)
            except (ValueError, TypeError, struct.error) as e:
                row = (0, 0, 0, 0, 0, 0, 0, False,
                       f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def png_audit(ds, bytes_col: str = "bytes", id_col: str = "image_id",
              concurrency: int | None = None, batch_size: int = 256):
    """Dataset of ``_SCHEMA`` rows — one audit row per blob.  Batch
    size may run larger than the decode stages: the walk touches
    headers + one CRC pass, not pixels."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        PngAuditStage(bytes_col=bytes_col, id_col=id_col), **kwargs)
