"""Corpus-level luma histogram from full decodes — the
distribution-drift *input*: one exact 256-bin brightness histogram
over every pixel of every image, the same statistic RAQC's
elevation-band change histograms consume (SURVEY §2.9 F1 feeds on
exactly this shape: per-epoch pixel-statistic histograms compared by
PSI/KS).

Plan shape (the engine's combiner discipline):

1. actor-pool decode stage emits the per-image NONZERO bins only
   (``bin = luma_cents // 100``, exact int64 counts) — a render or
   flat image contributes a handful of rows, a photo ≤ 256, never
   ``n_px``;
2. a per-block combiner re-bincounts the long rows, so at most 256
   rows per BLOCK enter the shuffle;
3. a final 256-key ``groupby(bin).sum(n_px)`` — constant-size
   all-to-all regardless of corpus size.

All counts exact int64 → the corpus histogram is layout-deterministic
and SQL-oracle-able.

Gates: closed-form unit tests (`test_lumahist`) and the end-to-end
driver oracle `q176_lumahist_documents` — two-tone renders whose
corpus histogram has the UNION ALL closed form in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image
from .exposure import luma_cents

_SCHEMA = pa.schema([
    pa.field("bin", pa.int64()),
    pa.field("n_px", pa.int64()),
])


def luma_bins_of(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bins, counts) — nonzero 0..255 luma-value bins of one image."""
    v = luma_cents(arr).ravel() // 100
    counts = np.bincount(v, minlength=256)
    nz = np.nonzero(counts)[0]
    return nz.astype(np.int64), counts[nz].astype(np.int64)


class LumaHistStage:
    """Callable class for ``map_batches`` actor pools — emits long
    (bin, n_px) rows, already per-batch combined."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt"):
        self.bytes_col, self.fmt_col = bytes_col, fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        acc = np.zeros(256, dtype=np.int64)
        for i, fmt in enumerate(fmts):
            try:
                arr = decode_image(row_bytes(i), fmt)
            except (DecodeError, TypeError, ValueError):
                continue  # undecodable rows are the decode check's job
            acc += np.bincount(luma_cents(arr).ravel() // 100,
                               minlength=256)
        nz = np.nonzero(acc)[0]
        return pa.Table.from_pydict(
            {"bin": nz.astype(np.int64), "n_px": acc[nz]},
            schema=_SCHEMA)


def luma_histogram(ds, bytes_col: str = "bytes", fmt_col: str = "fmt",
                   concurrency: int | None = None,
                   batch_size: int = 128):
    """Dataset of ``(bin, n_px)`` — the corpus-wide exact luma
    histogram (≤ 256 rows)."""
    from ray.data.aggregate import Sum

    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    long_rows = ds.map_batches(
        LumaHistStage(bytes_col=bytes_col, fmt_col=fmt_col), **kwargs)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bin", sort=False, as_index=False).sum()

    return (long_rows.map_batches(combine, batch_format="pandas")
            .groupby("bin").aggregate(Sum("n_px", alias_name="n_px")))
