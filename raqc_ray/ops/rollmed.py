"""Per-key rolling MEDIAN over a trailing ROWS frame — the holistic
window aggregate the distributive rolling family (`ops/window.py`
SUM/AVG, `ops/distinctwin.py` COUNT DISTINCT) cannot express: a
median needs the frame's order statistics, not a running scalar.

Exact integer contract: values quantize to cents ``floor(v*scale +
0.5)`` and the emitted statistic is ``med2 = lo_mid + hi_mid`` — TWICE
the median — so even-length frames (the first ``window-1`` rows of
every key) stay in int64 with no float midpoint; the SQL oracle is
``CAST(2 * MEDIAN(...) OVER (... ROWS BETWEEN k PRECEDING AND CURRENT
ROW) AS BIGINT)`` bit-for-bit.

Vectorization (no per-row Python, no per-group loop on the fast
path): each sorted block builds ONE ``(rows, window)`` gather matrix
of every row's trailing frame — out-of-group slots take an int64
sentinel — then a single ``np.sort(axis=1)`` orders every frame at
once and ``take_along_axis`` picks both middles of each row's VALID
prefix (length ``min(offset+1, window)``).  O(rows * window log
window) with ~6 numpy calls per block.

Plan shape: ONE ``ds.sort(key)`` + sorted-block scan
(`ops/groupscan.scan_sorted_groups`), boundary groups re-scanned per
group — the shared window-family plan; a key's rows must fit one
worker (irreducible whole-group contract), hot keys ride the
groupscan skew re-dispatch.

RAQC analog: none — SURVEY §2 training-data surface (robust rolling
baselines for the anomaly screens q114/q115; median shrugs off the
spikes a rolling mean chases).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["grouped_rolling_median2"]

_SENT = np.int64(2**62)


def _med2_segment(v: np.ndarray, off: np.ndarray,
                  window: int) -> np.ndarray:
    """med2 for each row of (possibly multi-group) value array ``v``
    where ``off[i]`` is row i's offset inside its own group."""
    n = len(v)
    r = np.arange(n, dtype=np.int64)
    t = np.arange(window, dtype=np.int64)[None, :]
    src = r[:, None] - np.int64(window - 1) + t
    valid = src >= (r - off)[:, None]
    mat = np.where(valid, v[np.clip(src, 0, n - 1)], _SENT)
    mat.sort(axis=1)
    ln = np.minimum(off + 1, window).astype(np.int64)
    lo = np.take_along_axis(mat, ((ln - 1) // 2)[:, None], axis=1)
    hi = np.take_along_axis(mat, (ln // 2)[:, None], axis=1)
    return (lo + hi).ravel()


def grouped_rolling_median2(ds, key: str, order_by: str, id_col: str,
                            value_col: str, window: int = 5,
                            scale: int = 100,
                            out_col: str = "med2"):
    """Dataset ``(key, id_col, out_col)`` — one row per input row:
    int64 ``lo_mid + hi_mid`` (= 2x median) of the trailing ``window``
    cents values in per-key ``(order_by, id_col)`` order.  Null-free
    input contract (fixture guarantee shared with the window
    family)."""
    if window < 1:
        raise ValueError("grouped_rolling_median2: window >= 1")
    from .groupscan import scan_sorted_groups

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: df[key],
            order_by: df[order_by],
            id_col: df[id_col],
            "__vi": np.floor(
                df[value_col].to_numpy(dtype=np.float64) * scale + 0.5
            ).astype(np.int64),
        })

    pds = ds.map_batches(prep, batch_format="pandas")

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.sort_values([order_by, id_col], kind="mergesort")
             .reset_index(drop=True))
        off = np.arange(len(s), dtype=np.int64)
        return pd.DataFrame({
            key: s[key],
            id_col: s[id_col],
            out_col: _med2_segment(
                s["__vi"].to_numpy(dtype=np.int64), off, window),
        })

    def block_fn(interior: pd.DataFrame, gs: np.ndarray,
                 ge: np.ndarray) -> pd.DataFrame:
        s = (interior.sort_values([key, order_by, id_col],
                                  kind="mergesort")
             .reset_index(drop=True))
        kk = s[key].to_numpy()
        n = len(s)
        new = np.ones(n, dtype=bool)
        new[1:] = kk[1:] != kk[:-1]
        starts = np.flatnonzero(new)
        grp = np.cumsum(new) - 1
        off = np.arange(n, dtype=np.int64) - starts[grp]
        return pd.DataFrame({
            key: s[key],
            id_col: s[id_col],
            out_col: _med2_segment(
                s["__vi"].to_numpy(dtype=np.int64), off, window),
        })

    from ._join_util import arrow_schema

    out_empty = (arrow_schema(pds).empty_table().to_pandas()
                 [[key, id_col]].copy())
    out_empty[out_col] = pd.Series(dtype="int64")
    return scan_sorted_groups(pds, key, group_fn, out_empty,
                              min_group=1, block_fn=block_fn)
