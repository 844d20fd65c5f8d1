"""JPEG quality forensics WITHOUT decode — recover the encoder's IJG
quality factor from the quantization tables in the DQT segments.  A
training corpus that claims "original photos" but is full of q≤70
re-encodes has a provenance problem; this stage measures it for the
cost of a header walk (the `ops/pngaudit` / `ops/dcstats` triage
tier).

Method: the IJG scaling law maps quality → table deterministically
(`jpeg._quality_scale`, ITU-T T.81 Annex K base tables).  The LUMA
map is INJECTIVE over q = 1..100 (verified in the unit gate); the
chroma table saturates to all-255 for q ≤ 3, so recovery is
LUMA-DRIVEN: the stage precomputes all 100 candidate zigzag byte
strings per table id ONCE PER ACTOR (`__init__` — the ST4
stateful-stage discipline), recovers q by exact dictionary lookup on
the luma table, then requires every other table to byte-match the
expected table at that q (a consistency check that tolerates the
chroma saturation collision):

- ``q_est``   exact quality when BOTH tables match one q; ``-1`` for
              foreign tables (another encoder's DQT — still a valid,
              meaningful forensic signal)
- ``n_dqt``   DQT tables seen before SOS

``ok=false`` degradation on container damage (bad SOI, truncated
segment walk).

Scale shape: embarrassingly parallel; header-only walk (stops at
SOS), no entropy decode, no pixels.

Gates: roundtrip unit tests (`test_jpegquality` — every q in a sweep
recovers exactly; a perturbed table reports -1) and the end-to-end
driver oracle `q182_jpegquality_documents` — renders encoded at
q = 50 + d%46 vs the trivial closed form.
"""

from __future__ import annotations

import struct

import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..jpeg import _QC, _QY, ZIGZAG, _quality_scale

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("q_est", pa.int64()),
    pa.field("n_dqt", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


def _candidates() -> tuple[dict[bytes, int], dict[tuple[int, int], bytes]]:
    """(luma zigzag_bytes → quality) lookup for q = 1..100 (injective
    for the luma base table; asserted in tests) plus the forward map
    (table_id, quality) → expected zigzag bytes used as the
    consistency check on non-luma tables."""
    luma: dict[bytes, int] = {}
    expected: dict[tuple[int, int], bytes] = {}
    for q in range(1, 101):
        for tid, base in ((0, _QY), (1, _QC)):
            qt = _quality_scale(base, q)
            key = bytes(int(qt[z]) for z in ZIGZAG)
            expected[(tid, q)] = key
            if tid == 0:
                luma[key] = q
    return luma, expected


def walk_dqt(data: bytes) -> list[tuple[int, bytes]]:
    """(table_id, 64 zigzag bytes) per DQT table up to SOS; raises
    ValueError on container damage."""
    if len(data) < 4 or data[0:2] != b"\xFF\xD8":
        raise ValueError("bad SOI")
    pos, n = 2, len(data)
    tables: list[tuple[int, bytes]] = []
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # length-less
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        end = pos + 2 + seglen
        if seglen < 2 or end > n:
            raise ValueError(f"truncated segment 0x{marker:02X}")
        if marker == 0xDB:
            body = data[pos + 4:end]
            bp = 0
            while bp < len(body):
                pq_tq = body[bp]
                if pq_tq >> 4 != 0:  # 16-bit tables: skip (foreign)
                    bp += 1 + 128
                    continue
                tables.append((pq_tq & 0x0F, bytes(body[bp + 1:bp + 65])))
                bp += 65
        elif marker == 0xDA:  # SOS — headers done
            return tables
        pos = end
    raise ValueError("no SOS marker")


class JpegQualityStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, bytes_col: str = "bytes",
                 id_col: str = "image_id"):
        self.bytes_col, self.id_col = bytes_col, id_col
        self._luma, self._expected = _candidates()  # once per actor

    def _recover(self, tabs: list[tuple[int, bytes]]) -> int:
        """Luma-driven exact quality; -1 on any foreign table."""
        qs = {self._luma.get(tb, -1) for tid, tb in tabs if tid == 0}
        if len(qs) != 1 or -1 in qs:
            return -1
        (q,) = qs
        for tid, tb in tabs:
            if tid != 0 and self._expected.get((tid, q)) != tb:
                return -1
        return q

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("q_est", "n_dqt", "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i in range(len(ids)):
            try:
                tabs = walk_dqt(bytes(row_bytes(i)))
                row = (self._recover(tabs), len(tabs), True, None)
            except (ValueError, TypeError, struct.error) as e:
                row = (0, 0, False, f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def jpeg_quality(ds, bytes_col: str = "bytes",
                 id_col: str = "image_id",
                 concurrency: int | None = None, batch_size: int = 256):
    """Dataset of ``_SCHEMA`` rows — one forensic row per blob."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        JpegQualityStage(bytes_col=bytes_col, id_col=id_col), **kwargs)
