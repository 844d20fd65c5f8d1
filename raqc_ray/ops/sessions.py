"""Gap-based sessionization — stateful streaming window as a custom
operator (SURVEY.md "custom operators" route (a): sort + grouped scan,
no raw actors).

Splits each key's event stream into sessions wherever the gap between
consecutive timestamps exceeds ``gap``, and emits one aggregate row per
session (start / end / event count / value sum). Equivalent SQL is the
classic ``LAG`` → flag → running-``SUM`` → ``GROUP BY`` chain, which is
the q32 oracle.

Plan: ONE ``sort`` by key (the only all-to-all) + one
:func:`scan_sorted_groups` pass with ``min_group=1`` (a singleton event
is a complete session). Per group the scan is fully vectorized: stable
sort by ``(ts, tiebreak)``, boundary flags from one diff, per-session
aggregates via ``np.add.reduceat`` over 1-D arrays (the 2-D reduceat
pathology documented in BASELINE.md does not apply).

Determinism: session assignment is invariant to the order of equal
timestamps (their gap is zero either way), and min/max/count/sum per
session are order-insensitive, so output matches SQL bit-for-bit after
the gate's canonical float rounding.

Partitioning assumption: one key's full history fits a worker block
(same contract as :mod:`raqc_ray.ops.asof`); hot keys should be
time-bucketed by the caller with a carry-in session row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .groupscan import scan_sorted_groups


def sessionize(ds, key: str, ts: str, gap, value_col: str | None = None,
               tiebreak: str | None = None):
    """Returns one sessions Dataset.

    ``gap``: ``pd.Timedelta`` / ``np.timedelta64``. Output columns:
    key, session_id (1-based per key in time order), session_start,
    session_end, n_events[, sum_value].
    """
    gap = np.timedelta64(pd.Timedelta(gap))
    cols = {
        key: pd.Series(dtype="int64"),
        "session_id": pd.Series(dtype="int64"),
        "session_start": pd.Series(dtype="datetime64[us]"),
        "session_end": pd.Series(dtype="datetime64[us]"),
        "n_events": pd.Series(dtype="int64"),
    }
    if value_col is not None:
        cols["sum_value"] = pd.Series(dtype="float64")
    out_empty = pd.DataFrame(cols)

    sort_cols = [ts] + ([tiebreak] if tiebreak else [])

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(sort_cols, kind="mergesort")
        t = s[ts].to_numpy()
        new = np.ones(len(s), dtype=bool)
        new[1:] = (t[1:] - t[:-1]) > gap
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(s))
        out = {
            key: np.full(len(starts), g[key].iloc[0], dtype=np.int64),
            "session_id": np.arange(1, len(starts) + 1, dtype=np.int64),
            "session_start": t[starts],
            "session_end": t[ends - 1],
            "n_events": (ends - starts).astype(np.int64),
        }
        if value_col is not None:
            v = s[value_col].to_numpy(dtype=np.float64)
            out["sum_value"] = np.add.reduceat(np.nan_to_num(v), starts)
            nval = np.add.reduceat((~np.isnan(v)).astype(np.int64), starts)
            out["sum_value"] = np.where(nval == 0, np.nan, out["sum_value"])
        return pd.DataFrame(out)

    return scan_sorted_groups(ds, key, group_fn, out_empty, min_group=1)
