"""Per-image color census from a full decode — the validation stage
that classifies chromatic content: grayscale-masquerading-as-RGB
detection (r==g==b everywhere), channel balance (exact per-channel
sums expose tint/white-balance defects), palette size (distinct packed
RGB count — a 2-color "photo" is a render or a corrupt decode), and a
colorfulness score (saturation proxy ``max(r,g,b)-min(r,g,b)`` summed
exactly).

Stateful actor-pool stage (SURVEY §2.3 ST4 shape, `ExposureStage` /
`BorderStage` sibling): zero-copy Arrow byte slices, vectorized
per-image numpy (packed-int32 ``np.unique`` for the palette, channel
reductions for the rest — no Python pixel loops), per-row ``ok=false``
degradation on decode errors.  All outputs exact int64 in RAW 0-255
units (no luma weighting), so every downstream aggregate is
layout-deterministic:

- ``n_px``                  pixel count
- ``sum_r / sum_g / sum_b`` exact per-channel sums
- ``n_gray``                pixels with r == g == b
- ``n_colors``              distinct (r, g, b) triples
- ``sat_sum``               sum of per-pixel ``max - min``

Overflow headroom: 255 * n_px per channel — int64 holds ~3.6e16
pixels per image.

Scale shape: embarrassingly parallel per image, no shuffle; decode
dominates, so size ``batch_size`` small (payload-heavy rows) and let
the actor pool own the arithmetic.

Gates: closed-form unit tests on planted arrays (`test_color_census`)
and the end-to-end driver oracle `q173_color_documents` —
deterministic half-gray/half-color renders pushed through the REAL
decode path (ppm AND png) vs a closed-form SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("n_px", pa.int64()),
    pa.field("sum_r", pa.int64()),
    pa.field("sum_g", pa.int64()),
    pa.field("sum_b", pa.int64()),
    pa.field("n_gray", pa.int64()),
    pa.field("n_colors", pa.int64()),
    pa.field("sat_sum", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


def color_census_of(arr: np.ndarray) -> tuple[int, ...]:
    """(n_px, sum_r, sum_g, sum_b, n_gray, n_colors, sat_sum) of one
    decoded (h, w, 3) uint8 image — all exact ints."""
    px = arr.reshape(-1, 3).astype(np.int64)
    r, g, b = px[:, 0], px[:, 1], px[:, 2]
    packed = (r << 16) | (g << 8) | b
    hi = px.max(axis=1)
    lo = px.min(axis=1)
    return (int(px.shape[0]), int(r.sum()), int(g.sum()), int(b.sum()),
            int(((r == g) & (g == b)).sum()),
            int(np.unique(packed).size), int((hi - lo).sum()))


class ColorCensusStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("n_px", "sum_r", "sum_g", "sum_b", "n_gray",
                "n_colors", "sat_sum", "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i, fmt in enumerate(fmts):
            try:
                arr = decode_image(row_bytes(i), fmt)
                row = (*color_census_of(arr), True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (0, 0, 0, 0, 0, 0, 0, False,
                       f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def color_census(ds, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id",
                 concurrency: int | None = None,
                 batch_size: int = 128):
    """Dataset of ``_SCHEMA`` rows — one color-census row per image."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        ColorCensusStage(bytes_col=bytes_col, fmt_col=fmt_col,
                         id_col=id_col), **kwargs)
