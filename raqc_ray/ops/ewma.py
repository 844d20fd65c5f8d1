"""Per-key exponentially weighted moving average (EWMA control chart)
in EXACT integer arithmetic — the infinite-memory sequential scan the
finite-window rolling family (`ops/window.py`) cannot express.

The recurrence (alpha = ``num/den``, rational)::

    y_1 = v_1
    y_t = y_{t-1} + floor(num * (v_t - y_{t-1}) / den)

over ``v = floor(value*scale + 0.5)`` (int64 cents) is evaluated per
key in total ``(order_by, id_col)`` order.  Every step is int64 floor
arithmetic, so the output is bit-identical across block layouts and
matches a recursive-CTE SQL oracle token-for-token — the same
integer-cents discipline as `ops/rollup.py` / `ops/graph.pagerank`.
The flooring makes the recurrence non-linear, so there is no closed
form to vectorize over time; instead the scan is vectorized over
GROUPS:

1. ONE ``ds.sort(key)`` range partition + sorted-block scan
   (`ops/groupscan.scan_sorted_groups`) — the plan every per-key
   window op here shares;
2. inside each block, one stable re-sort by ``(key, order_by,
   id_col)`` orders every group's rows; all groups then advance in
   LOCKSTEP — a Python loop over TIME STEPS (bounded by the longest
   per-key sequence, not by rows) whose body is one vectorized numpy
   gather/update/scatter across every group still active;
3. boundary groups (first/last key of each block) take the per-group
   sequential path — they are ≤ 2 per block by construction.

Scale note: wall per block is O(max_seq_len) numpy calls; per-key
event sequences are user-activity-bounded (thousands), not
corpus-bounded.  A single key's rows must fit in one worker (the
irreducible whole-group contract, same as the rest of the window
family; the skew re-dispatch in `groupscan.py` owns hot keys).

RAQC analog: none — SURVEY §2 training-data surface (streaming
anomaly screens over per-user metrics; the exact-audit complement of
the windowed z-score family q114/q115).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["grouped_int_ewma"]


def grouped_int_ewma(ds, key: str, order_by: str, id_col: str,
                     value_col: str, num: int = 1, den: int = 5,
                     scale: int = 100, out_col: str = "ewma"):
    """Dataset ``(key, id_col, out_col)`` — one int64 EWMA value per
    input row, scaled by ``scale``.  ``id_col`` must make the per-key
    order total (it is the tiebreak after ``order_by`` and the output
    row identity).  ``0 < num < den`` required.  Null-free input
    contract (the fixture guarantee shared with the window family):
    callers with nullable ``value_col``/keys filter upstream."""
    if not (0 < num < den):
        raise ValueError("grouped_int_ewma: need 0 < num < den")

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

    def _chain(vi: np.ndarray) -> np.ndarray:
        """Sequential path for ONE group (boundary groups only)."""
        out = np.empty(len(vi), dtype=np.int64)
        cur = int(vi[0])
        out[0] = cur
        for t in range(1, len(vi)):
            cur = cur + (num * (int(vi[t]) - cur)) // den
            out[t] = cur
        return out

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.sort_values([order_by, id_col], kind="mergesort")
             .reset_index(drop=True))
        return pd.DataFrame({
            key: s[key],
            id_col: s[id_col],
            out_col: _chain(s["__vi"].to_numpy(dtype=np.int64)),
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
        ends = np.append(starts[1:], n)
        vi = s["__vi"].to_numpy(dtype=np.int64)
        out = np.empty(n, dtype=np.int64)
        # lockstep: process groups longest-first so the active set is
        # always a prefix (no boolean re-mask per step)
        lens = ends - starts
        order = np.argsort(-lens, kind="stable")
        st = starts[order]
        ln = lens[order]  # descending
        cur = vi[st].copy()
        out[st] = cur
        t_max = int(ln[0]) if n else 0
        for t in range(1, t_max):
            k = int(np.searchsorted(-ln, -t, side="left"))
            idx = st[:k] + t
            c = cur[:k]
            c = c + (num * (vi[idx] - c)) // den
            cur[:k] = c
            out[idx] = c
        return pd.DataFrame({key: kk, id_col: s[id_col].to_numpy(),
                             out_col: out})

    out_empty = (arrow_schema(pds).empty_table().to_pandas()
                 [[key, id_col]].copy())
    out_empty[out_col] = pd.Series(dtype="int64")
    return scan_sorted_groups(pds, key, group_fn, out_empty,
                              min_group=1, block_fn=block_fn)
