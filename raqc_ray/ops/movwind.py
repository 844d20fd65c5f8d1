"""Pixel-level moving-window neighbor filter — the SIGNATURE RAQC
operator (SURVEY §2.8 W1: `[R] multi_array.py ::
PatternFilters.mov_wind / mov_wind2 (rec., H)`), implemented at its
ORIGINAL granularity.  The engine's partition-level min-support
debounce (SURVEY's table mapping, `pipelines/validate.py` W1) keeps
the verdict semantics; this stage restores the reference's actual
spatial semantics now that the engine has real pixel access: a
candidate-flagged pixel survives only if the fraction of flagged
pixels in its ``k × k`` neighborhood reaches a threshold — isolated
speckle dies, coherent flag BLOCKS survive.

Exact-arithmetic contract (everything layout-deterministic and
SQL-oracle-able):

- candidate flags: luma cents ``<= lo_c`` or ``>= hi_c`` (the
  exposure clipping rule — the stage parameter, not a hard-wire)
- neighbor counts: 2-D box sums over the flag mask via an integral
  image (one ``cumsum`` pyramid per image — no Python pixel loops,
  no convolution library)
- edge windows CLIP to the image (the true window area is used, as
  the reference's edge handling implies `(rec., M)`)
- survival rule: ``boxsum * den >= num * area`` — the exact rational
  form of ``frac >= num/den``, no float division

Outputs per image: ``n_px``, ``n_flag`` (raw candidates), ``n_kept``
(surviving the debounce).  ``ok=false`` degradation on decode errors.

Scale shape: embarrassingly parallel per image (the window never
crosses image boundaries), no shuffle; the box-sum pyramid is O(h*w)
int64.

Gates: closed-form unit tests (`test_movwind` — rectangle survives,
speckle dies, boundary-fraction tie kept, edge clipping exact) and
the end-to-end driver oracle `q179_movwind_documents` — planted
rectangle + isolated speckles vs a closed-form SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image
from .exposure import luma_cents

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("n_px", pa.int64()),
    pa.field("n_flag", pa.int64()),
    pa.field("n_kept", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


def box_sums(mask: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(boxsum, area) int64 grids: for every pixel, the count of True
    cells and the true (edge-clipped) cell count of the centered
    ``k × k`` window.  ``k`` must be odd."""
    if k % 2 != 1:
        raise ValueError("window size must be odd")
    h, w = mask.shape
    r = k // 2
    # integral image with a zero border: I[y, x] = sum mask[:y, :x]
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(mask, axis=0, dtype=np.int64), axis=1,
              out=ii[1:, 1:])
    y = np.arange(h)
    x = np.arange(w)
    y1 = np.maximum(y - r, 0)[:, None]
    y2 = np.minimum(y + r, h - 1)[:, None] + 1
    x1 = np.maximum(x - r, 0)[None, :]
    x2 = np.minimum(x + r, w - 1)[None, :] + 1
    s = ii[y2, x2] - ii[y1, x2] - ii[y2, x1] + ii[y1, x1]
    area = (y2 - y1) * (x2 - x1)
    return s, area


def mov_wind_of(arr: np.ndarray, k: int, num: int, den: int,
                lo_c: int, hi_c: int) -> tuple[int, int, int]:
    """(n_px, n_flag, n_kept) of one decoded image."""
    c = luma_cents(arr)
    flags = (c <= lo_c) | (c >= hi_c)
    s, area = box_sums(flags, k)
    kept = flags & (s * den >= num * area)
    return (int(c.size), int(flags.sum()), int(kept.sum()))


class MovWindStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id", k: int = 3,
                 num: int = 4, den: int = 9,
                 lo_c: int = 2000, hi_c: int = 23500):
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)
        self.k, self.num, self.den = int(k), int(num), int(den)
        self.lo_c, self.hi_c = int(lo_c), int(hi_c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("n_px", "n_flag", "n_kept", "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i, fmt in enumerate(fmts):
            try:
                arr = decode_image(row_bytes(i), fmt)
                row = (*mov_wind_of(arr, self.k, self.num, self.den,
                                    self.lo_c, self.hi_c), True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (0, 0, 0, False, f"{type(e).__name__}: {e}")
            for kk, v in zip(cols, row):
                out[kk].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def mov_wind_flags(ds, bytes_col: str = "bytes", fmt_col: str = "fmt",
                   id_col: str = "image_id", k: int = 3,
                   num: int = 4, den: int = 9,
                   lo_c: int = 2000, hi_c: int = 23500,
                   concurrency: int | None = None,
                   batch_size: int = 128):
    """Dataset of ``_SCHEMA`` rows — one debounced-flag census per
    image."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        MovWindStage(bytes_col=bytes_col, fmt_col=fmt_col,
                     id_col=id_col, k=k, num=num, den=den,
                     lo_c=lo_c, hi_c=hi_c), **kwargs)
