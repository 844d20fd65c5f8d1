"""Temporal co-activity pair extraction — the sliding-window edge
builder: two users are co-active when their events of the same type
fall within ``window_us`` of each other.  The cell-bucketing builder
(`_coengagement_pairs`: hash users into (type, hour) cells) is the
cheap approximation — it MISSES pairs straddling a cell boundary and
over-links within a cell; this op computes the true windowed
relation, the standard construction for temporal interaction graphs.

Exact integer contract: timestamps as int64 microseconds; output
``(val_a, val_b, n)`` with ``val_a < val_b`` — n counts EVENT pairs
within the window (the edge weight), replayable as a SQL self-join
``ABS(t_a - t_b) <= W`` token-for-token.

Vectorized sweep per key group: sort by time, one ``searchsorted``
finds each event's forward window end, and the (i, j) pair list
materializes with a ranges-concatenation gather — no per-row Python.
Each unordered pair is enumerated exactly once (forward-only
ranges).  Per-event fan-out above ``max_fanout`` raises explicitly
(the `cooc.max_distinct` discipline): a burst window that pairs one
event with thousands means the window is wrong for the data, not
that the engine should silently emit quadratic output.

Plan shape: ONE ``ds.sort(type)`` + sorted-block scan; per-pair
weights then collapse through per-block partials + ONE hash groupby
(pairs, not events, shuffle).  A type's events must fit one worker
(few, huge groups — the kendall regime; the skew re-dispatch owns
boundary groups).

RAQC analog: none — SURVEY §2 training-data surface (the exact
sibling of the q143/q144/q148 graph builders).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["temporal_coactivity_pairs"]


def _window_pairs(t: np.ndarray, u: np.ndarray, window_us: int,
                  max_fanout: int) -> pd.DataFrame:
    """(val_a, val_b, partial n) for ONE time-sorted group."""
    n = len(t)
    hi = np.searchsorted(t, t + np.int64(window_us), side="right")
    counts = hi - np.arange(1, n + 1)
    counts = np.maximum(counts, 0)
    if counts.size and int(counts.max()) > max_fanout:
        raise ValueError(
            f"temporal_coactivity_pairs: an event pairs with "
            f"{int(counts.max())} others inside the window "
            f"(> max_fanout={max_fanout}) — shrink window_us or raise "
            "the cap")
    total = int(counts.sum())
    if total == 0:
        return pd.DataFrame({"val_a": pd.Series(dtype="int64"),
                             "val_b": pd.Series(dtype="int64"),
                             "__n": pd.Series(dtype="int64")})
    # ranges concatenation: j runs over (i+1 .. hi_i) for every i
    i_idx = np.repeat(np.arange(n), counts)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    j_idx = (np.arange(total) - np.repeat(offs, counts)
             + np.repeat(np.arange(1, n + 1), counts))
    ua, ub = u[i_idx], u[j_idx]
    keep = ua != ub
    lo = np.minimum(ua[keep], ub[keep])
    hi_u = np.maximum(ua[keep], ub[keep])
    d = pd.DataFrame({"val_a": lo, "val_b": hi_u})
    g = d.groupby(["val_a", "val_b"], sort=False).size().rename("__n")
    return g.reset_index().astype("int64")


def temporal_coactivity_pairs(ds, type_col: str, ts_col: str,
                              user_col: str, window_us: int,
                              max_fanout: int = 10_000):
    """Dataset ``(val_a, val_b, n)`` — distinct co-active user pairs
    with event-pair counts; same-user event pairs excluded.
    Null-free input contract (callers filter upstream)."""
    from ray.data.aggregate import Sum

    from .groupscan import scan_sorted_groups

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            type_col: df[type_col],
            "__t": df[ts_col].to_numpy(dtype="datetime64[us]")
                             .astype(np.int64)
            if np.issubdtype(df[ts_col].dtype, np.datetime64)
            else df[ts_col].to_numpy(dtype=np.int64),
            "__u": df[user_col].to_numpy(dtype=np.int64),
        })

    pds = ds.map_batches(prep, batch_format="pandas")

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        o = np.argsort(g["__t"].to_numpy(dtype=np.int64),
                       kind="stable")
        return _window_pairs(g["__t"].to_numpy(dtype=np.int64)[o],
                             g["__u"].to_numpy(dtype=np.int64)[o],
                             window_us, max_fanout)

    empty = pd.DataFrame({"val_a": pd.Series(dtype="int64"),
                          "val_b": pd.Series(dtype="int64"),
                          "__n": pd.Series(dtype="int64")})
    partials = scan_sorted_groups(pds, type_col, group_fn, empty,
                                  min_group=2)
    return (partials.groupby(["val_a", "val_b"])
            .aggregate(Sum("__n", alias_name="n")))
