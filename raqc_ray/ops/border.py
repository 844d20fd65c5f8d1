"""Letterbox / pillarbox border detection from a full decode — the
validation stage that measures constant-color bars on each image edge
(a real ingest-quality defect: padded thumbnails, broadcast letterbox,
scanner margins) so downstream crop rules and aspect-ratio stats see
the CONTENT rectangle, not the canvas.

Detection contract (per side, corner-anchored):

- ``top``    = number of leading rows whose every pixel equals the
               top-left corner pixel ``arr[0, 0]``
- ``left``   = number of leading columns, same anchor
- ``bottom`` = number of trailing rows anchored at ``arr[-1, -1]``
- ``right``  = number of trailing columns, same anchor

A true letterbox/pillarbox bar spans the full width/height, so the
bar rows/cols are exactly the uniform ones; the first content row or
column breaks uniformity and stops the count.  An entirely uniform
image reports the full dimension on all four sides (callers treat
``top == h`` as "blank canvas").

Stateful actor-pool stage (SURVEY §2.3 ST4 shape, `ExposureStage`
sibling): zero-copy Arrow byte slices, vectorized per-image numpy
(row/col uniformity masks + argmin run-length — no Python pixel
loops), per-row ``ok=false`` degradation on decode errors.  All
outputs exact int64; embarrassingly parallel per image, no shuffle.

Gates: planted-array unit tests (`test_border`) and the end-to-end
driver oracle `q172_letterbox_documents` — deterministic bordered
renders through the REAL decode path vs a closed-form SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("h", pa.int64()),
    pa.field("w", pa.int64()),
    pa.field("top", pa.int64()),
    pa.field("bottom", pa.int64()),
    pa.field("left", pa.int64()),
    pa.field("right", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


def _leading(mask: np.ndarray) -> int:
    """Length of the leading True run of a 1-D bool mask."""
    if mask.all():
        return int(mask.size)
    return int(np.argmin(mask))


def border_widths_of(arr: np.ndarray) -> tuple[int, int, int, int]:
    """(top, bottom, left, right) constant-border widths of one
    decoded (h, w, 3) image, per the corner-anchored contract."""
    tl = arr[0, 0]
    br = arr[-1, -1]
    row_tl = (arr == tl).all(axis=(1, 2))
    col_tl = (arr == tl).all(axis=(0, 2))
    row_br = (arr == br).all(axis=(1, 2))
    col_br = (arr == br).all(axis=(0, 2))
    return (_leading(row_tl), _leading(row_br[::-1]),
            _leading(col_tl), _leading(col_br[::-1]))


class BorderStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("h", "w", "top", "bottom", "left", "right",
                "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i, fmt in enumerate(fmts):
            try:
                arr = decode_image(row_bytes(i), fmt)
                t, b, le, r = border_widths_of(arr)
                row = (arr.shape[0], arr.shape[1], t, b, le, r,
                       True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (0, 0, 0, 0, 0, 0, False,
                       f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def border_stats(ds, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id",
                 concurrency: int | None = None,
                 batch_size: int = 128):
    """Dataset of ``_SCHEMA`` rows — one border row per image."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        BorderStage(bytes_col=bytes_col, fmt_col=fmt_col,
                    id_col=id_col), **kwargs)
