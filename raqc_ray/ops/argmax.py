"""Grouped ARG_MAX / "row with the max" — carry whole payload rows to
the per-key maximum of an ordering column, without sorting the table.

Ray-Data-first plan (round-5 port, VERDICT r4 #1): each block keeps
ONE row per key present in it (stable sort inside the block +
``tail(1)`` per key — vectorized pandas), so at most keys × blocks
candidate rows survive; the candidates then feed ONE
``scan_sorted_groups`` pass whose vectorized ``block_fn`` picks every
key's global winner with a single ``np.lexsort`` — no per-key
``map_groups`` task (millions of tasks at corpus scale), no second
hash exchange.  ``tiebreak`` makes the pick total — SQL ``ROW_NUMBER()
OVER (... ORDER BY order DESC, tiebreak DESC) = 1`` semantics,
bit-reproducible across layouts.

RAQC analog: none (SURVEY §2.5 stops at min/max scalars); part of the
§2 training-data-pipeline surface (best-scoring caption per image,
latest revision per document).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def grouped_arg_max(ds, key: str, order_by: str,
                    tiebreak: str | None = None):
    """Dataset with one full input row per key: the row holding the
    key's maximum ``(order_by, tiebreak)``.  All input columns are
    preserved."""
    from ._join_util import arrow_schema
    from .groupscan import scan_sorted_groups
    from .vhist import gather_segments

    sort_cols = [order_by] + ([tiebreak] if tiebreak else [])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(sort_cols, kind="mergesort")
        return s.groupby(key, sort=False, as_index=False).tail(1)

    partial = ds.map_batches(pick, batch_format="pandas")

    def block_fn(df: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        idx, segid, sizes, cum_excl = gather_segments(starts, ends)
        ob = df[order_by].to_numpy()[idx]
        if tiebreak:
            tb = df[tiebreak].to_numpy()[idx]
            order = np.lexsort((tb, ob, segid))
        else:
            order = np.lexsort((ob, segid))
        # stable lexsort → last row of each segment is the max under
        # (order_by, tiebreak); without tiebreak, ties resolve to the
        # last candidate in scan order (the single-block semantics)
        winners = order[cum_excl + sizes - 1]
        return df.iloc[idx[winners]]

    out_empty = arrow_schema(ds).empty_table().to_pandas()
    return scan_sorted_groups(partial, key, pick, out_empty,
                              min_group=1, block_fn=block_fn,
                              out_schema=arrow_schema(ds))


def grouped_mode(ds, key: str, value_col: str):
    """Per-key MODE: the most frequent ``value_col`` per key, smallest
    value winning ties — SQL ``ROW_NUMBER() OVER (PARTITION BY key
    ORDER BY COUNT(*) DESC, value ASC) = 1`` semantics.

    Plan: per-block partial counts (vectorized pandas groupby) feed
    ONE ``scan_sorted_groups`` pass; duplicate ``(key, value)``
    partial rows are merged in-segment (``vhist.merge_runs`` — counts
    must be global before the argmax), then each segment's winner is
    the first merged run (value-ascending order) holding the segment's
    maximum count.  Output columns: ``key``, ``value_col``, ``n``.
    """
    from .groupscan import scan_sorted_groups
    from .vhist import (gather_segments, key_pandas_dtype, merge_runs,
                        seg_bounds_of)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        d = (df.groupby([key, value_col], sort=False)
             .size().reset_index(name="n"))
        return d

    cnt = ds.map_batches(counts, batch_format="pandas")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        # boundary groups carry unmerged partials — merge first
        s = g.groupby(value_col, as_index=False)["n"].sum()
        s = s.sort_values(["n", value_col], ascending=[True, False],
                          kind="mergesort")
        out = s.tail(1).copy()
        out.insert(0, key, g[key].iloc[0])
        return out

    def block_fn(df: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        idx, segid, sizes, cum_excl = gather_segments(starts, ends)
        kv_seg = df[key].to_numpy()[starts]
        v = df[value_col].to_numpy()[idx]
        c = df["n"].to_numpy(dtype=np.int64)[idx]
        order = np.lexsort((v, segid))
        _, seg_m, v_m, c_m = merge_runs(segid, v[order], c[order])
        sm_starts, sm_sizes = seg_bounds_of(seg_m, len(sizes))
        maxn = np.maximum.reduceat(c_m, sm_starts)
        win = c_m == np.repeat(maxn, sm_sizes)
        cand = np.flatnonzero(win)
        # first winning run per segment = smallest value among maxima
        # (runs are value-ascending within each segment)
        _, first = np.unique(seg_m[cand], return_index=True)
        sel = cand[first]
        return pd.DataFrame({key: kv_seg[seg_m[sel]],
                             value_col: v_m[sel],
                             "n": c_m[sel]})

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        value_col: pd.Series(dtype=key_pandas_dtype(ds, value_col)),
        "n": pd.Series(dtype="int64")})
    return scan_sorted_groups(cnt, key, pick, out_empty, min_group=1,
                              block_fn=block_fn)


def grouped_topk_frequent(ds, key: str, value_col: str, k: int = 3):
    """Per-key TOP-K most frequent values with counts and 1-based
    rank — :func:`grouped_mode` generalized to k (SQL ``ROW_NUMBER()
    OVER (PARTITION BY key ORDER BY COUNT(*) DESC, value ASC) <= k``;
    ties break to the smaller value, the mode convention).

    Plan: identical to :func:`grouped_mode` — per-block count
    partials, ONE sort, in-segment run-merge — with a vectorized
    top-k epilogue: merged runs re-sorted by ``(segid, −count,
    value)`` and ranked by a per-segment cumcount, keeping rank ≤ k.
    Output columns: ``key``, ``value_col``, ``n``, ``rank``."""
    from .groupscan import scan_sorted_groups
    from .vhist import (gather_segments, key_pandas_dtype, merge_runs,
                        seg_bounds_of)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([key, value_col], sort=False)
                .size().reset_index(name="n"))

    cnt = ds.map_batches(counts, batch_format="pandas")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(value_col, as_index=False)["n"].sum()
        s = s.sort_values(["n", value_col], ascending=[False, True],
                          kind="mergesort").head(k)
        out = s.reset_index(drop=True)
        out.insert(0, key, g[key].iloc[0])
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    def block_fn(df: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        idx, segid, sizes, cum_excl = gather_segments(starts, ends)
        kv_seg = df[key].to_numpy()[starts]
        v = df[value_col].to_numpy()[idx]
        c = df["n"].to_numpy(dtype=np.int64)[idx]
        order = np.lexsort((v, segid))
        _, seg_m, v_m, c_m = merge_runs(segid, v[order], c[order])
        # rank merged runs per segment by (count desc, value asc):
        # runs are value-ascending, so a stable sort on -count keeps
        # the tie order
        order2 = np.lexsort((-c_m, seg_m))
        seg_s = seg_m[order2]
        new = np.ones(len(seg_s), dtype=bool)
        new[1:] = seg_s[1:] != seg_s[:-1]
        first = np.flatnonzero(new)
        rank = (np.arange(len(seg_s), dtype=np.int64)
                - np.repeat(first, np.diff(np.append(first,
                                                     len(seg_s)))) + 1)
        keep = rank <= k
        sel = order2[keep]
        return pd.DataFrame({key: kv_seg[seg_m[sel]],
                             value_col: v_m[sel], "n": c_m[sel],
                             "rank": rank[keep]})

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        value_col: pd.Series(dtype=key_pandas_dtype(ds, value_col)),
        "n": pd.Series(dtype="int64"),
        "rank": pd.Series(dtype="int64")})
    return scan_sorted_groups(cnt, key, pick, out_empty, min_group=1,
                              block_fn=block_fn)
