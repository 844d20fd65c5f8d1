"""Per-key MAXIMUM DRAWDOWN — the running-peak deficit statistic
(the risk measure behind every trading/SLA dashboard): over the
``(order_by, id)``-sorted cents sequence, ``dd = max_t(max_{s<=t}
v_s - v_t)`` — how far the metric ever fell from its best.  A purely
windowed engine cannot see it (the peak is unbounded-preceding);
here it is one segment-cummax pass.

Exact integer contract: cents quantization, int64 throughout; the
oracle is ``MAX(runmax - v)`` over ``MAX(v) OVER (ROWS UNBOUNDED
PRECEDING)`` token-for-token.

Vectorization: the same group-shifted ``np.maximum.accumulate``
segment-cummax trick as `ops/intervals` (each group's shifted values
dominate all earlier groups'), with the identical overflow guard and
per-group fallback.

Plan shape: ONE ``ds.sort(key)`` + sorted-block scan
(`ops/groupscan.scan_sorted_groups`), the shared window-family plan.

RAQC analog: none — SURVEY §2 training-data surface (the
peak-relative complement of the rolling z-score anomaly screens
q114/q115).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["grouped_max_drawdown"]


def grouped_max_drawdown(ds, key: str, order_by: str, id_col: str,
                         value_col: str, scale: int = 100):
    """Dataset ``(key, n, max_dd)`` — one int64 row per key:
    row count and the maximum peak-to-trough deficit in cents
    (0 for monotonically non-decreasing sequences).  Null-free input
    contract (fixture guarantee shared with the window family)."""
    from ._join_util import arrow_schema
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
        vi = s["__vi"].to_numpy(dtype=np.int64)
        dd = int((np.maximum.accumulate(vi) - vi).max())
        return pd.DataFrame({key: [s[key].iloc[0]],
                             "n": np.array([len(vi)], dtype=np.int64),
                             "max_dd": np.array([dd], dtype=np.int64)})

    def block_fn(interior: pd.DataFrame, gs: np.ndarray,
                 ge: np.ndarray) -> pd.DataFrame:
        s = (interior.sort_values([key, order_by, id_col],
                                  kind="mergesort")
             .reset_index(drop=True))
        kk = s[key].to_numpy()
        n = len(s)
        newg = np.ones(n, dtype=bool)
        newg[1:] = kk[1:] != kk[:-1]
        grp = np.cumsum(newg) - 1
        n_groups = int(grp[-1]) + 1 if n else 0
        vi = s["__vi"].to_numpy(dtype=np.int64)
        lo = int(vi.min()) if n else 0
        span = (int(vi.max()) - lo + 1) if n else 1
        g_starts = np.flatnonzero(newg)
        if n and n_groups * span < 2**62:
            f = (vi - lo) + grp * span
            run = np.maximum.accumulate(f) - grp * span + lo
            dd = run - vi
            out_dd = np.zeros(n_groups, dtype=np.int64)
            np.maximum.at(out_dd, grp, dd)
            cnt = np.bincount(grp, minlength=n_groups)
            return pd.DataFrame({key: kk[g_starts],
                                 "n": cnt.astype(np.int64),
                                 "max_dd": out_dd})
        g_ends = np.append(g_starts[1:], n)
        rows = []
        for a, b in zip(g_starts.tolist(), g_ends.tolist()):
            v = vi[a:b]
            rows.append((kk[a], b - a,
                         int((np.maximum.accumulate(v) - v).max())))
        return pd.DataFrame(rows, columns=[key, "n", "max_dd"])

    out_empty = (arrow_schema(pds).empty_table().to_pandas()
                 [[key]].copy())
    out_empty["n"] = pd.Series(dtype="int64")
    out_empty["max_dd"] = pd.Series(dtype="int64")
    return scan_sorted_groups(pds, key, group_fn, out_empty,
                              min_group=1, block_fn=block_fn)
