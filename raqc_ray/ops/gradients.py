"""Per-image gradient-ORIENTATION census — the directional-energy
screen the isotropic Laplacian sharpness op (`ops/sharpness.py`)
collapses: exact horizontal vs vertical first-difference energy of
the integer 3-channel-sum grid.  Separates interlacing / scanline
artifacts (vertical-heavy), text/document frames (horizontal-heavy
strokes), 90°-rotated variants of the same content (gx/gy swap), and
flat frames (both zero) — per-image numbers a corpus-level rotation
or artifact audit can threshold.

Per image (decoded ``(h, w, 3)`` uint8), on ``c = R+G+B`` (int32,
0..765 — no float luma, bit-deterministic):

- ``gx_sum = Σ_{y,x} |c[y,x+1] - c[y,x]|``  (h × (w-1) terms)
- ``gy_sum = Σ_{y,x} |c[y+1,x] - c[y,x]|``  ((h-1) × w terms)
- ``dominant`` = 1 if gx_sum > gy_sum, -1 if gx_sum < gy_sum, else 0
  (comparison-only — deliberately NO ratio column, so there is no
  floor-vs-truncate division semantics to reconcile with SQL on
  negative numerators, the r3-advice q62 lesson)

Overflow headroom: |diff| ≤ 765 per term → int64 holds ~1.2e16
terms per image.

Scale shape: embarrassingly parallel per image — stateful actor-pool
stage (SURVEY §2.3 ST4, `SharpnessStage` sibling), no shuffle,
decode-bound; two shifted-view numpy reductions per image, no Python
pixel loops; ok=false degradation on decode errors.

Gates: closed-form unit tests (column stripes → gy=0 and exact gx;
transpose swaps gx/gy; flat → zeros; random-array brute equivalence)
and the END-TO-END driver oracle `q197_gradients_documents` —
deterministic stripe/checker renders through the REAL decode path vs
the closed form.

RAQC analog: none (SURVEY §2 image-QA surface — the directional
complement of the isotropic sharpness census q174).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image

__all__ = ["gradient_stats_of", "GradientStage", "gradient_census"]

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("gx_sum", pa.int64()),
    pa.field("gy_sum", pa.int64()),
    pa.field("dominant", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


def gradient_stats_of(arr: np.ndarray) -> tuple[int, int, int]:
    """``(gx_sum, gy_sum, dominant)`` of one decoded image."""
    if arr.size == 0:
        return 0, 0, 0
    c = arr.astype(np.int32).sum(axis=2)
    gx = int(np.abs(c[:, 1:].astype(np.int64) - c[:, :-1]).sum())
    gy = int(np.abs(c[1:, :].astype(np.int64) - c[:-1, :]).sum())
    return gx, gy, int(gx > gy) - int(gx < gy)


class GradientStage:
    """Callable class for ``map_batches`` actor pools (ST4 shape)."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("gx_sum", "gy_sum", "dominant", "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i, fmt in enumerate(fmts):
            try:
                arr = decode_image(row_bytes(i), fmt)
                row = (*gradient_stats_of(arr), True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (0, 0, 0, False, f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def gradient_census(ds, bytes_col: str = "bytes", fmt_col: str = "fmt",
                    id_col: str = "image_id",
                    concurrency: int | None = None,
                    batch_size: int = 128):
    """Dataset of ``_SCHEMA`` rows — one gradient-census row per image."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        GradientStage(bytes_col, fmt_col, id_col), **kwargs)
