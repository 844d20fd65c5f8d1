"""Exact grouped Kendall correlation numerator — the rank-trend
statistic (concordant − discordant pair count) between two columns,
per key, in EXACT int64 arithmetic.

S(key) = sum over unordered row pairs of sign(x_i - x_j) * sign(v_i
- v_j); ties in EITHER coordinate contribute 0 (the tau-b numerator,
Kendall 1945).  Complements the existing rank stats: Spearman (q130)
needs global ranks, AUC (q140) compares a binary label — Kendall is
the pairwise-trend test ("do values rise with time?") and its exact
numerator is pure integer, so the oracle is a bit-identical SQL
self-join SUM(SIGN*SIGN).

Naive cost is O(n^2) per key; this op computes S in O(n log n) per
group with a FULLY VECTORIZED bottom-up merge (Knight, JASA 1966):

1. per group, rows sort by ``(x, v)``; the strict-inversion count B
   of the v-sequence then counts exactly the discordant pairs with
   x_i != x_j (within an equal-x run v is ascending, so no
   within-run pair is ever counted);
2. inversions are counted WITHOUT a Python merge loop: the group's
   v-sequence pads to a power-of-two width with an int64 sentinel
   and each doubling level reshapes to ``(runs, 2w)`` rows and does
   ONE stable ``np.argsort(axis=1)`` — for a right-half element at
   merged position p and right offset j, ``p - j`` is the number of
   left-half elements <= it (stable sort breaks ties left-first), so
   ``w - (p - j)`` is its strict-inversion contribution; log2(n)
   vectorized passes, no per-run work;
3. concordant pairs follow by counting, not enumeration::

       A = C(n,2) - B - T_v            (strict non-inversions)
       S = A - B - sum over equal-x runs (C(m,2) - T_v(run))

   where T_v counts equal-v pairs (inside an equal-x run every pair
   has sign(dx)=0, and since v is sorted within the run they were
   all counted in A except its own v-ties — subtract them back out).

Scale shape: ONE sort range-partition + sorted-block scan
(`ops/groupscan.scan_sorted_groups`), the plan the whole window/stat
family shares; a group's rows must fit one worker (irreducible for a
whole-group statistic).  C(n,2) at n = 10^9 overflows int64 only
past n ~ 6.1e9 rows PER KEY — documented bound.

RAQC analog: none — SURVEY §2 training-data surface (drift/trend
screens over per-key metric streams, the rank-robust complement of
the grouped linear-regression slope q63).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["grouped_kendall_numerator"]

_SENTINEL = np.int64(2**62)


def _strict_inversions(v: np.ndarray) -> int:
    """Number of pairs i<j with v[j] < v[i], exact, O(n log n) with
    log n vectorized passes (no Python loop over runs/rows)."""
    n = len(v)
    if n < 2:
        return 0
    width = 1 << int(np.ceil(np.log2(n)))
    buf = np.full(width, _SENTINEL, dtype=np.int64)
    buf[:n] = v
    total = 0
    w = 1
    while w < width:
        rows = buf.reshape(-1, 2 * w)
        # stable argsort: ties place left-half elements first, so for
        # a right element at merged position p (own offset j in the
        # right half) p - j = #left <= it; strict inversions add
        # w - (p - j).  Sentinel pads are a suffix of every row at
        # every level, so a real right half always faces a real left
        # half (pads vs pads contribute w - (p - j) = 0 exactly:
        # stable sort keeps all-equal sentinels in place).
        order = np.argsort(rows, axis=1, kind="stable")
        pos = np.empty_like(order)
        np.put_along_axis(pos, order, np.arange(2 * w)[None, :]
                          .repeat(rows.shape[0], 0), axis=1)
        right_pos = pos[:, w:]
        j = np.arange(w)[None, :]
        total += int((w - (right_pos - j)).sum())
        buf = np.take_along_axis(rows, order, axis=1).reshape(-1)
        w *= 2
    return total


def _pairs(counts: np.ndarray) -> int:
    c = counts.astype(np.int64)
    return int((c * (c - 1) // 2).sum())


def _kendall_group(x: np.ndarray, v: np.ndarray) -> int:
    """Exact S for one group (any order of input rows)."""
    order = np.lexsort((v, x))
    xs, vs = x[order], v[order]
    n = len(xs)
    b = _strict_inversions(vs)
    t_v = _pairs(np.unique(v, return_counts=True)[1])
    total_pairs = n * (n - 1) // 2
    a = total_pairs - b - t_v
    # equal-x runs: subtract their (concordant-as-counted) pairs back
    run_id = np.concatenate([[0], np.cumsum(xs[1:] != xs[:-1])])
    run_counts = np.bincount(run_id)
    run_pair_total = _pairs(run_counts)
    # equal-(x,v) pairs inside runs are v-ties, never counted in A —
    # add them back; (run, v) segments of the lexsorted rows find them
    both = np.concatenate([[0], np.cumsum(
        (xs[1:] != xs[:-1]) | (vs[1:] != vs[:-1]))])
    run_tv = _pairs(np.bincount(both))
    return a - b - (run_pair_total - run_tv)


def grouped_kendall_numerator(ds, key: str, x_col: str, value_col: str,
                              scale: int = 100):
    """Dataset ``(key, n, s_num)`` — exact Kendall tau-b numerator of
    (``x_col``, ``value_col``) per key.  ``x_col`` must already be
    int64-comparable (timestamps pass as integer microseconds);
    ``value_col`` is quantized ``floor(v*scale + 0.5)`` cents.
    Null-free input contract (fixture guarantee shared with the
    window family)."""
    from .groupscan import scan_sorted_groups

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col]
        if np.issubdtype(x.dtype, np.datetime64):
            xi = x.to_numpy(dtype="datetime64[us]").astype(np.int64)
        else:
            xi = x.to_numpy(dtype=np.int64)
        return pd.DataFrame({
            key: df[key],
            "__x": xi,
            "__v": np.floor(
                df[value_col].to_numpy(dtype=np.float64) * scale + 0.5
            ).astype(np.int64),
        })

    pds = ds.map_batches(prep, batch_format="pandas")

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = _kendall_group(g["__x"].to_numpy(dtype=np.int64),
                           g["__v"].to_numpy(dtype=np.int64))
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n": np.array([len(g)], dtype=np.int64),
                             "s_num": np.array([s], dtype=np.int64)})

    from ._join_util import arrow_schema

    out_empty = (arrow_schema(pds).empty_table().to_pandas()
                 [[key]].copy())
    out_empty["n"] = pd.Series(dtype="int64")
    out_empty["s_num"] = pd.Series(dtype="int64")
    return scan_sorted_groups(pds, key, group_fn, out_empty, min_group=2)
