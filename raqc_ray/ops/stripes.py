"""Sensor-defect stripe census — the image-QC screen for dead or
stuck scanlines: a camera/scanner defect (or a corrupt decode) shows
up as rows that are a single constant value, columns that never vary,
or the SAME row repeated several times in a run (a stuck line buffer).
All counts are exact integers from a full decode, so corpus-level
thresholds ("quarantine images with ≥ 2 dead lines") are
layout-deterministic.

Per image (decoded ``(h, w, 3)`` uint8):

- ``n_const_rows``  rows whose pixels are all one value
- ``n_const_cols``  columns whose pixels are all one value
- ``max_row_run``   length of the longest run of byte-identical
                    consecutive rows (1 for any non-empty healthy
                    image — the stuck-buffer signal when > 1)

Vectorized: three axis-wise equality reductions plus a break-position
diff for the run length; no per-pixel Python.

Stateful actor-pool stage (SURVEY §2.3 ST4 shape, `ExposureStage`
sibling); undecodable rows degrade to ``ok=false`` rows.  Scale
shape: embarrassingly parallel per image, no shuffle, decode-bound.

Gates: planted-array closed-form unit tests (`test_ops_round4t`) and
the end-to-end driver oracle `q186_stripes_documents` — deterministic
renders with planted dead rows / repeat blocks / all-flat frames
through the REAL decode path vs the trivial closed form.
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
    pa.field("n_const_rows", pa.int64()),
    pa.field("n_const_cols", pa.int64()),
    pa.field("max_row_run", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


def stripe_stats_of(arr: np.ndarray) -> tuple[int, int, int, int, int]:
    """(h, w, n_const_rows, n_const_cols, max_row_run) of one image."""
    h, w = int(arr.shape[0]), int(arr.shape[1])
    if h == 0 or w == 0:
        return h, w, 0, 0, 0
    const_rows = (arr == arr[:, :1, :]).all(axis=(1, 2))
    const_cols = (arr == arr[:1, :, :]).all(axis=(0, 2))
    same = (arr[1:] == arr[:-1]).all(axis=(1, 2))
    breaks = np.flatnonzero(
        np.concatenate(([True], ~same, [True])))
    return (h, w, int(const_rows.sum()), int(const_cols.sum()),
            int(np.diff(breaks).max()))


class StripeStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("h", "w", "n_const_rows", "n_const_cols",
                "max_row_run", "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i, fmt in enumerate(fmts):
            try:
                arr = decode_image(row_bytes(i), fmt)
                row = (*stripe_stats_of(arr), True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (0, 0, 0, 0, 0, False,
                       f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def stripe_census(ds, bytes_col: str = "bytes", fmt_col: str = "fmt",
                  id_col: str = "image_id",
                  concurrency: int | None = None,
                  batch_size: int = 128):
    """Dataset of ``_SCHEMA`` rows — one stripe-census row per image."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        StripeStage(bytes_col=bytes_col, fmt_col=fmt_col,
                    id_col=id_col), **kwargs)
