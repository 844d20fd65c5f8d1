"""Per-image sharpness census from a full decode — blur / focus
screening via the 4-neighbor Laplacian of the exact luma-cents grid.
A sharp image has strong local second derivatives (edges); a blurred,
out-of-focus or flat image has almost none.  This is the classic
"variance of Laplacian" focus measure, restated in exact integers so
the corpus-level blur-rate aggregate is layout-deterministic.

Per interior pixel (1..h-2, 1..w-2) of the luma-cents grid ``c``
(``floor(luma*100 + 0.5)``, exactly ``100*v`` for gray pixels):

    lap = |4*c[y,x] - c[y-1,x] - c[y+1,x] - c[y,x-1] - c[y,x+1]|

- ``n_int``     interior pixel count ``(h-2)*(w-2)``
- ``lap_sum_c`` exact int64 sum of ``lap`` (total edge energy, cents)
- ``n_edge``    interior pixels with ``lap > thr_c`` (edge census)

Stateful actor-pool stage (SURVEY §2.3 ST4 shape, `ExposureStage`
sibling): zero-copy Arrow byte slices, one vectorized numpy stencil
per image (shifted-view arithmetic, no Python pixel loops), per-row
``ok=false`` degradation on decode errors.  Images smaller than 3x3
report zeros (no interior).

Overflow headroom: lap ≤ 8 * 25 500 cents per pixel → int64 holds
~4.5e13 interior pixels per image.

Scale shape: embarrassingly parallel per image, no shuffle; decode
dominates, so size ``batch_size`` small and let the actor pool own
the stencil.

Gates: closed-form unit tests on planted arrays (`test_sharpness`)
and the end-to-end driver oracle `q174_sharpness_documents` —
deterministic two-tone renders whose only edge is the center seam,
pushed through the REAL decode path (ppm AND png) vs a closed-form
SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image
from .exposure import luma_cents

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("n_int", pa.int64()),
    pa.field("lap_sum_c", pa.int64()),
    pa.field("n_edge", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


def sharpness_of(arr: np.ndarray, thr_c: int) -> tuple[int, int, int]:
    """(n_int, lap_sum_c, n_edge) of one decoded (h, w, 3) image."""
    c = luma_cents(arr)
    h, w = c.shape
    if h < 3 or w < 3:
        return (0, 0, 0)
    lap = np.abs(4 * c[1:-1, 1:-1] - c[:-2, 1:-1] - c[2:, 1:-1]
                 - c[1:-1, :-2] - c[1:-1, 2:])
    return (int(lap.size), int(lap.sum()), int((lap > thr_c).sum()))


class SharpnessStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id", thr_c: int = 500):
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)
        self.thr_c = int(thr_c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("n_int", "lap_sum_c", "n_edge", "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i, fmt in enumerate(fmts):
            try:
                arr = decode_image(row_bytes(i), fmt)
                row = (*sharpness_of(arr, self.thr_c), True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (0, 0, 0, False, f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def sharpness_stats(ds, bytes_col: str = "bytes", fmt_col: str = "fmt",
                    id_col: str = "image_id", thr_c: int = 500,
                    concurrency: int | None = None,
                    batch_size: int = 128):
    """Dataset of ``_SCHEMA`` rows — one sharpness row per image."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        SharpnessStage(bytes_col=bytes_col, fmt_col=fmt_col,
                       id_col=id_col, thr_c=thr_c), **kwargs)
