"""Per-image channel-statistics census — the color-integrity screen
for a curated image corpus: exact per-channel first/second moments and
cross-channel products (pseudo-grayscale detection — RGB files that
are really gray waste 3× storage and poison color augmentations),
LSB bit-plane counts (re-quantized or synthetically generated images
show non-uniform least-significant bits), and the exact gray-pixel
count.

All outputs are exact int64 from one decode pass, so every derived
screen is layout-deterministic::

    pseudo-grayscale  ⇔  n_gray == n_px
    channel corr      =  (n*sum_rg - sum_r*sum_g) / sqrt(...)   (exact
                         numerator from these columns)
    LSB uniformity    =  |2*lsb_ch - n_px|  large ⇒ suspicious

Vectorized: channel sums / squares / cross products / bit masks are
whole-array numpy reductions, no per-pixel Python.  Stateful
actor-pool stage (ST4 shape, `ExposureStage` sibling); undecodable
rows degrade to ``ok=false``.

Overflow headroom: 255² * n_px per image ≤ int64 to ~1.4e14 pixels.

Gates: planted-array closed-form unit tests and the END-TO-END driver
oracle `q191_chanstats_documents` — two-tone renders with per-channel
offsets (and every-11th-doc true-grayscale frames) through the REAL
decode path vs the closed form.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image

_INT_COLS = ("n_px", "sum_r", "sum_g", "sum_b",
             "sum_rr", "sum_gg", "sum_bb",
             "sum_rg", "sum_rb", "sum_gb",
             "lsb_r", "lsb_g", "lsb_b", "n_gray")

_SCHEMA = pa.schema(
    [pa.field("image_id", pa.string())]
    + [pa.field(c, pa.int64()) for c in _INT_COLS]
    + [pa.field("ok", pa.bool_()), pa.field("error", pa.string())])


def channel_stats_of(arr: np.ndarray) -> tuple[int, ...]:
    """Exact channel census of one decoded (h, w, 3) uint8 image."""
    a = arr.astype(np.int64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    lsb = (arr & 1).sum(axis=(0, 1))
    return (int(r.size),
            int(r.sum()), int(g.sum()), int(b.sum()),
            int((r * r).sum()), int((g * g).sum()), int((b * b).sum()),
            int((r * g).sum()), int((r * b).sum()), int((g * b).sum()),
            int(lsb[0]), int(lsb[1]), int(lsb[2]),
            int(((r == g) & (g == b)).sum()))


class ChannelStatsStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = _INT_COLS + ("ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i, fmt in enumerate(fmts):
            try:
                arr = decode_image(row_bytes(i), fmt)
                row = (*channel_stats_of(arr), True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (*([0] * len(_INT_COLS)), False,
                       f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def channel_stats(ds, bytes_col: str = "bytes", fmt_col: str = "fmt",
                  id_col: str = "image_id",
                  concurrency: int | None = None,
                  batch_size: int = 128):
    """Dataset of ``_SCHEMA`` rows — one channel census per image."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        ChannelStatsStage(bytes_col=bytes_col, fmt_col=fmt_col,
                          id_col=id_col), **kwargs)
