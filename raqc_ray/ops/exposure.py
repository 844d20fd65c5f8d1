"""Per-image exposure / contrast census from a full decode — the
quality screen that flags under-exposed, blown-out and flat (low
contrast) images in one pass over the pixels.

Stateful actor-pool stage (SURVEY §2.3 ST4 shape, the `DcStatsStage`
sibling — that op screens from DC coefficients WITHOUT full pixels;
this one is the precise pass you run on the survivors).  ``__call__``
slices each row's bytes zero-copy off the Arrow binary buffer,
decodes, converts to luma cents ``floor(luma*100 + 0.5)`` and emits
exact int64 per-image statistics:

- ``n_px``            pixel count
- ``sum_c``           sum of luma cents
- ``sumsq_c``         sum of squared luma cents (contrast numerator:
                      ``n_px*sumsq_c - sum_c**2`` is the *exact*
                      population-variance numerator in cents²)
- ``n_lo`` / ``n_hi`` clipping census: pixels with luma cents
                      ``<= lo_c`` / ``>= hi_c``

Integer-cents discipline throughout: every emitted value is an exact
int64, so any downstream aggregate (corpus-wide clipping rate,
per-partition contrast percentile) is layout-deterministic.  Overflow
headroom: max cents 25 500 → sumsq per pixel ≤ 6.6e8, so a single
image may have up to ~1.4e10 pixels before ``sumsq_c`` leaves int64 —
five orders of magnitude above any real frame.

Undecodable rows degrade to ``ok=false`` rows (the `DecodeCheck`
per-row error contract) instead of failing the batch.

Scale shape: embarrassingly parallel per image, no shuffle; decode
dominates, so size ``batch_size`` small (payload-heavy rows) and let
the actor pool own the arithmetic.

Gates: closed-form unit tests on planted arrays (`test_exposure`) and
the end-to-end driver oracle `q171_exposure_documents` — deterministic
two-tone renders pushed through the REAL decode path vs a closed-form
SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("n_px", pa.int64()),
    pa.field("sum_c", pa.int64()),
    pa.field("sumsq_c", pa.int64()),
    pa.field("n_lo", pa.int64()),
    pa.field("n_hi", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])

_LUMA = np.array([0.299, 0.587, 0.114])


def luma_cents(arr: np.ndarray) -> np.ndarray:
    """Exact luma-cents grid of decoded (h, w, 3) uint8 pixels.

    For gray pixels (r=g=b=v) the weights sum to exactly 1.0 so the
    result is exactly ``100*v`` — the property the closed-form oracle
    relies on.
    """
    y = arr.astype(np.float64) @ _LUMA
    return np.floor(y * 100.0 + 0.5).astype(np.int64)


def pixel_stats_of(arr: np.ndarray, lo_c: int, hi_c: int
                   ) -> tuple[int, int, int, int, int]:
    """(n_px, sum_c, sumsq_c, n_lo, n_hi) of one decoded image."""
    c = luma_cents(arr).ravel()
    return (int(c.size), int(c.sum()), int((c * c).sum()),
            int((c <= lo_c).sum()), int((c >= hi_c).sum()))


class ExposureStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id",
                 lo_c: int = 2000, hi_c: int = 23500):
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)
        self.lo_c, self.hi_c = int(lo_c), int(hi_c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("n_px", "sum_c", "sumsq_c", "n_lo", "n_hi",
                "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i, fmt in enumerate(fmts):
            try:
                arr = decode_image(row_bytes(i), fmt)
                n, s, ss, lo, hi = pixel_stats_of(
                    arr, self.lo_c, self.hi_c)
                row = (n, s, ss, lo, hi, True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (0, 0, 0, 0, 0, False,
                       f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def exposure_stats(ds, bytes_col: str = "bytes", fmt_col: str = "fmt",
                   id_col: str = "image_id",
                   lo_c: int = 2000, hi_c: int = 23500,
                   concurrency: int | None = None,
                   batch_size: int = 128):
    """Dataset of ``_SCHEMA`` rows — one exposure row per image."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        ExposureStage(bytes_col=bytes_col, fmt_col=fmt_col,
                      id_col=id_col, lo_c=lo_c, hi_c=hi_c), **kwargs)
