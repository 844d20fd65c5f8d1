"""Periodic row-BANDING census — the frequency-domain-ish screen for
scanline interference, compression banding, refresh-line artifacts and
repeated-pattern (tiled-generator) frames: a vertical period of p rows
shows up as the argmax of the autocovariance of the per-row luma
profile.  Everything is EXACT int64 arithmetic, so the per-image
output is bit-deterministic and the SQL oracle can replay the
identical computation (no float spectral estimate to drift).

Per image (decoded ``(h, w, 3)`` uint8):

1. ``q_r  = (Σ_row (R+G+B)) // w``  — floor-averaged integer row luma
   (0..765), one vectorized reduction;
2. ``y_r  = h*q_r - Σ q``           — mean-centering scaled by h so it
   stays integer;
3. ``A_L  = Σ_r y_r * y_{r+L}``     — raw autocovariance numerators
   for lags ``L = 0..Lmax`` (``Lmax = min(h-1, 16)``), one
   ``np.dot`` per lag;
4. ``best_lag`` = the smallest lag in ``1..Lmax`` maximizing ``A_L``
   (np.argmax first-max == smallest-lag tie-break);
   ``periodic = 2*A_best > A_0`` (normalized autocorr > 0.5, exact
   integer comparison).

Overflow bound: ``|y| <= h*765`` so ``|A_L| <= h^3 * 585k`` — int64-
exact for ``h <= 20_000`` (asserted; beyond that a 100-TB deployment
would downsample rows first, which this stage leaves to the resize
op).

Scale shape: embarrassingly parallel per image — stateful actor-pool
stage (SURVEY §2.3 ST4, `StripeStage` sibling), no shuffle,
decode-bound; undecodable rows degrade to ``ok=false``.

Gates: closed-form unit tests (constant frame → all-zero y; exact
comb of period p → best_lag == p; aperiodic noise → periodic false)
plus the END-TO-END driver oracle `q195_banding_documents`:
deterministic constant-color-row renders through the REAL decode
path vs a DuckDB oracle that rebuilds q/y/A_L with the SAME integer
arithmetic (range + self-join per lag) and picks argmax with the
same tie-break — engine and SQL agree bit-for-bit, not approximately.

RAQC analog: none (SURVEY §2 image-QA surface — the vertical-period
complement of the scanline q186 census, which only sees CONSTANT or
REPEATED rows, not periodic modulation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image

__all__ = ["banding_stats_of", "BandingStage", "banding_census"]

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("best_lag", pa.int64()),
    pa.field("acv_peak", pa.int64()),
    pa.field("acv0", pa.int64()),
    pa.field("periodic", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])

_MAX_LAG = 16
_MAX_H = 20_000  # int64-exactness bound, see module docstring


def banding_stats_of(arr: np.ndarray, max_lag: int = _MAX_LAG
                     ) -> tuple[int, int, int, int]:
    """``(best_lag, acv_peak, acv0, periodic)`` of one decoded image."""
    h, w = int(arr.shape[0]), int(arr.shape[1])
    if h < 2 or w == 0:
        return 0, 0, 0, 0
    if h > _MAX_H:
        raise ValueError(f"banding census is int64-exact only for "
                         f"h <= {_MAX_H}, got {h}")
    s = arr.astype(np.int64).sum(axis=(1, 2))      # Σ_row (R+G+B)
    q = s // w                                      # 0..765
    y = h * q - int(q.sum())                        # |y| <= h*765
    lmax = min(h - 1, max_lag)
    acv = np.empty(lmax + 1, dtype=np.int64)
    for lag in range(lmax + 1):
        acv[lag] = int(np.dot(y[: h - lag], y[lag:]))
    best = 1 + int(np.argmax(acv[1:]))              # first max
    peak = int(acv[best])
    a0 = int(acv[0])
    return best, peak, a0, int(2 * peak > a0)


class BandingStage:
    """Callable class for ``map_batches`` actor pools (ST4 shape)."""

    def __init__(self, max_lag: int = _MAX_LAG, bytes_col: str = "bytes",
                 fmt_col: str = "fmt", id_col: str = "image_id"):
        self.max_lag = int(max_lag)
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("best_lag", "acv_peak", "acv0", "periodic",
                "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i, fmt in enumerate(fmts):
            try:
                arr = decode_image(row_bytes(i), fmt)
                row = (*banding_stats_of(arr, self.max_lag), True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (0, 0, 0, 0, False, f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def banding_census(ds, max_lag: int = _MAX_LAG, bytes_col: str = "bytes",
                   fmt_col: str = "fmt", id_col: str = "image_id",
                   concurrency: int | None = None, batch_size: int = 128):
    """Dataset of ``_SCHEMA`` rows — one banding-census row per image."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        BandingStage(max_lag, bytes_col, fmt_col, id_col), **kwargs)
