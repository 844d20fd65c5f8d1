"""Per-key INTERVAL UNION length — total covered extent and island
count of an overlapping interval set (the classic sweep-line merge):
"how many seconds was this user actually active", "how much of the
corpus timeline do these crawl windows cover" — double-counting
removed exactly.

Pure integer: intervals are int64 endpoints (timestamps pass as
microseconds); per key the op emits ``covered`` = total length of
the union and ``n_islands`` = number of maximal merged runs.  Both
are properties of the interval SET (order-free), so the op is
layout-deterministic with no ordering discipline, and the oracle is
the standard SQL islands idiom (MAX(end) OVER preceding -> gap flag
-> island group) token-for-token.

Sweep per group, fully vectorized: sort by (start, end), running
max of end, a new island starts where ``start > runmax(previous
ends)``; covered = sum over islands of (max end - min start).  The
block fast path processes EVERY group of a sorted block in one numpy
pass using a segment-cummax trick — ends normalize to the block's
origin and shift by ``group_index * (span+1)``, making each group's
values dominate all earlier groups' so ONE ``np.maximum.accumulate``
yields the per-group running max; blocks where ``n_groups * span``
nears int64 fall back to the per-group path (explicit guard, no
silent wrap).

Plan shape: ONE ``ds.sort(key)`` + sorted-block scan
(`ops/groupscan.scan_sorted_groups`), the shared window-family plan;
a key's intervals must fit one worker (irreducible whole-group
contract), hot keys ride the groupscan skew re-dispatch.

RAQC analog: none — SURVEY §2 training-data surface (coverage /
activity accounting over event streams; the set-union complement of
the sessionization op q32, which splits by gaps instead of merging
overlaps).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["grouped_interval_union"]


def _union_stats(st: np.ndarray, en: np.ndarray) -> tuple[int, int]:
    """(covered, n_islands) for ONE group's intervals, any order."""
    order = np.lexsort((en, st))
    s, e = st[order], en[order]
    run = np.maximum.accumulate(e)
    new = np.ones(len(s), dtype=bool)
    new[1:] = s[1:] > run[:-1]
    starts = np.flatnonzero(new)
    ends_idx = np.append(starts[1:], len(s)) - 1
    covered = int((run[ends_idx] - s[starts]).sum())
    return covered, len(starts)


def grouped_interval_union(ds, key: str, start_col: str, end_col: str):
    """Dataset ``(key, covered, n_islands)`` — one int64 row per key.
    Endpoints must satisfy ``end >= start`` (zero-length intervals
    contribute 0 length but count toward their island).  Timestamp
    columns pass as integer microseconds.  Null-free input contract
    (fixture guarantee shared with the window family)."""
    from ._join_util import arrow_schema
    from .groupscan import scan_sorted_groups

    def _to_i64(col: pd.Series) -> np.ndarray:
        if np.issubdtype(col.dtype, np.datetime64):
            return col.to_numpy(dtype="datetime64[us]").astype(np.int64)
        return col.to_numpy(dtype=np.int64)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: df[key],
            "__s": _to_i64(df[start_col]),
            "__e": _to_i64(df[end_col]),
        })

    pds = ds.map_batches(prep, batch_format="pandas")

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        covered, k = _union_stats(g["__s"].to_numpy(dtype=np.int64),
                                  g["__e"].to_numpy(dtype=np.int64))
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "covered": np.array([covered], dtype=np.int64),
            "n_islands": np.array([k], dtype=np.int64),
        })

    def block_fn(interior: pd.DataFrame, gs: np.ndarray,
                 ge: np.ndarray) -> pd.DataFrame:
        srt = (interior.sort_values([key, "__s", "__e"],
                                    kind="mergesort")
               .reset_index(drop=True))
        kk = srt[key].to_numpy()
        s = srt["__s"].to_numpy(dtype=np.int64)
        e = srt["__e"].to_numpy(dtype=np.int64)
        n = len(s)
        newg = np.ones(n, dtype=bool)
        newg[1:] = kk[1:] != kk[:-1]
        grp = np.cumsum(newg) - 1
        n_groups = int(grp[-1]) + 1 if n else 0
        lo = min(int(s.min()), int(e.min())) if n else 0
        hi = max(int(s.max()), int(e.max())) if n else 0
        span = hi - lo + 1
        if n and n_groups * span < 2**62:
            # segment cummax in ONE pass: each group's shifted ends
            # dominate every earlier group's, so the global running
            # max restarts exactly at group boundaries
            f = (e - lo) + grp * span
            run = np.maximum.accumulate(f) - grp * span + lo
            new = newg.copy()
            new[1:] |= s[1:] > run[:-1]
            isl_starts = np.flatnonzero(new)
            isl_ends = np.append(isl_starts[1:], n) - 1
            isl_grp = grp[isl_starts]
            length = run[isl_ends] - s[isl_starts]
            covered = np.zeros(n_groups, dtype=np.int64)
            np.add.at(covered, isl_grp, length)
            n_isl = np.bincount(isl_grp, minlength=n_groups)
            g_starts = np.flatnonzero(newg)
            return pd.DataFrame({
                key: kk[g_starts],
                "covered": covered,
                "n_islands": n_isl.astype(np.int64),
            })
        # overflow-risk (or empty) fallback: per-group sweep
        g_starts = np.flatnonzero(newg)
        g_ends = np.append(g_starts[1:], n)
        frames = [(kk[a], *_union_stats(s[a:b], e[a:b]))
                  for a, b in zip(g_starts.tolist(), g_ends.tolist())]
        return pd.DataFrame(frames, columns=[key, "covered",
                                             "n_islands"])

    out_empty = (arrow_schema(pds).empty_table().to_pandas()
                 [[key]].copy())
    out_empty["covered"] = pd.Series(dtype="int64")
    out_empty["n_islands"] = pd.Series(dtype="int64")
    return scan_sorted_groups(pds, key, group_fn, out_empty,
                              min_group=1, block_fn=block_fn)
