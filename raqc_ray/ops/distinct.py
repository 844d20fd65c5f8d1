"""Exact grouped COUNT(DISTINCT x) — the two-level aggregation
pattern, with a per-block dedup combiner so the shuffle moves unique
pairs, not rows.

Plan: (1) ``map_batches`` drops duplicate ``(key, x)`` pairs inside
each block — on real streams (events per user, docs per domain) this
shrinks the exchange by the per-block repeat factor before anything
moves; (2) ONE range-partitioning sort of the surviving pairs
(``scan_sorted_groups``) — each key segment's distinct count is its
number of equal-value runs, counted vectorized per block (round 5;
previously two hash aggregates). This is the exact
complement of the HLL sketch path (`raqc_ray/sketches/hll.py`): use
HLL inside the validation pipeline where ±2% suffices at 10^12 rows,
and this operator where exactness is the contract (dedup accounting,
per-split leakage audits).

RAQC analog: none (SURVEY §2.5 A7 covers the approximate path); part
of the §2 "large-scale training-data pipeline" surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def grouped_count_distinct(ds, key: str, distinct_col: str,
                           out_col: str = "n_distinct"):
    """Dataset with columns ``(key, out_col)`` — exact distinct count
    of ``distinct_col`` per ``key``.

    Round-5 plan: block-deduped pairs feed ONE
    ``scan_sorted_groups`` sort; each segment's distinct count is its
    number of equal-value runs (``vhist.merge_runs``), counted
    vectorized for every key of a block at once.  Replaces the old
    TWO hash aggregates (``groupby([key, x])`` then
    ``groupby(key)``) — one exchange instead of two, and no
    per-group Python in Ray's aggregate path."""
    from .groupscan import scan_sorted_groups
    from .vhist import (gather_segments, key_pandas_dtype, merge_runs,
                        seg_bounds_of)

    def block_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, distinct_col]].drop_duplicates()

    pairs = ds.map_batches(block_dedup, batch_format="pandas")

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({key: [g[key].iloc[0]],
                             out_col: [np.int64(
                                 g[distinct_col].nunique())]})

    def block_fn(df: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        idx, segid, sizes, cum_excl = gather_segments(starts, ends)
        v = df[distinct_col].to_numpy()[idx]
        order = np.lexsort((v, segid))
        _, seg_m, _, _ = merge_runs(segid, v[order],
                                    np.ones(len(v), dtype=np.int64))
        _, sm_sizes = seg_bounds_of(seg_m, len(sizes))
        return pd.DataFrame({key: df[key].to_numpy()[starts],
                             out_col: sm_sizes})

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        out_col: pd.Series(dtype="int64")})
    return scan_sorted_groups(pairs, key, group_fn, out_empty,
                              min_group=1, block_fn=block_fn)


def grouped_collect_set(ds, key: str, val: str, sep: str = ",",
                        out_col: str = "vals"):
    """Per-key sorted distinct-value concatenation — SQL
    ``string_agg(DISTINCT val, sep ORDER BY val)`` — plus
    ``n_distinct``.  Plan (round-5 port, VERDICT r4 #1): per-block
    drop_duplicates combiner (the value stream shrinks to
    block-distinct pairs), then the partials feed ONE
    ``scan_sorted_groups`` pass whose ``block_fn`` dedups and joins
    every key of a sorted block in one pandas call — no hash
    ``groupby(key, val)`` exchange, no task-per-key ``map_groups``.
    Values are stringified BEFORE sorting (string collation, "10" <
    "2") so the concatenation is deterministic across layouts — the
    original semantics."""
    from .groupscan import scan_sorted_groups
    from .vhist import gather_segments, key_pandas_dtype

    def block_sets(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, val]].drop_duplicates()

    dedup = ds.map_batches(block_sets, batch_format="pandas")

    def join_fn(g: pd.DataFrame) -> pd.DataFrame:
        # boundary groups may carry cross-block duplicates — the set()
        # collapses them
        vals = sorted(set(map(str, g[val].tolist())))
        return pd.DataFrame({key: [g[key].iloc[0]],
                             out_col: [sep.join(vals)],
                             "n_distinct": [np.int64(len(vals))]})

    def block_fn(df: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        idx, segid, sizes, cum_excl = gather_segments(starts, ends)
        kv_seg = df[key].to_numpy()[starts]
        d = pd.DataFrame({"__seg": segid,
                          "__v": df[val].to_numpy()[idx]})
        d = d.drop_duplicates()
        d["__v"] = d["__v"].map(str)
        d = d.sort_values(["__seg", "__v"], kind="mergesort")
        g = d.groupby("__seg", sort=True)["__v"]
        joined = g.agg(sep.join)
        counts = g.size()
        segs = joined.index.to_numpy(dtype=np.int64)
        return pd.DataFrame({key: kv_seg[segs],
                             out_col: joined.to_numpy(),
                             "n_distinct": counts.to_numpy(
                                 dtype=np.int64)})

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        out_col: pd.Series(dtype="object"),
        "n_distinct": pd.Series(dtype="int64")})
    return scan_sorted_groups(dedup, key, join_fn, out_empty,
                              min_group=1, block_fn=block_fn)


def rolling_count_distinct(ds, bucket_col: str, distinct_col: str,
                           window: int = 7, out_col: str = "n_distinct"):
    """Trailing-window exact COUNT DISTINCT per integer bucket —
    ``COUNT(DISTINCT x)`` over buckets ``[b - window + 1, b]`` for every
    bucket VALUE present in the input (the classic "7-day active users
    per day", which plain SQL windows cannot express because
    ``COUNT(DISTINCT)`` is not a window aggregate).

    Plan: (1) block-local distinct ``(x, bucket)`` carriers (per-block
    repeats — the overwhelming mass on activity streams — collapse
    before anything moves); (2) each carrier fans out to the ≤
    ``window`` bucket values it covers, pre-filtered to buckets that
    actually occur (the occurring-bucket set is time-range-sized —
    days/hours, thousands at most — broadcast via ``ray.put``, never a
    shuffle); (3) :func:`grouped_count_distinct` collapses cross-block
    duplicate carriers and counts — the only all-to-all moves unique
    ``(window_bucket, x)`` pairs, ≤ ``window`` × the distinct-carrier
    count.  RAQC analog: none (SURVEY §2.9 covers flag windows);
    §2 training-data surface (activity coverage / engagement windows).
    """
    import ray
    from ray.data.aggregate import Count

    def carriers(df: pd.DataFrame) -> pd.DataFrame:
        return df[[distinct_col, bucket_col]].drop_duplicates()

    carr = ds.map_batches(carriers, batch_format="pandas").materialize()
    buckets = np.sort(
        carr.groupby(bucket_col).aggregate(Count(alias_name="__c"))
        .to_pandas()[bucket_col].to_numpy(dtype=np.int64))
    if len(buckets) == 0:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            bucket_col: pd.Series(dtype="int64"),
            out_col: pd.Series(dtype="int64")}))
    bref = ray.put(buckets)

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        bs = ray.get(bref)
        b = df[bucket_col].to_numpy(dtype=np.int64)
        x = df[distinct_col].to_numpy()
        # carrier at bucket b covers window buckets in [b, b+window-1];
        # searchsorted bounds restrict to OCCURRING buckets only
        lo = np.searchsorted(bs, b, side="left")
        hi = np.searchsorted(bs, b + window - 1, side="right")
        reps = (hi - lo).astype(np.int64)
        idx = np.repeat(np.arange(len(b)), reps)
        # ragged range lo[i]..hi[i] via one cumsum trick
        flat = np.arange(reps.sum(), dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
        offs = flat - np.repeat(starts, reps)
        wb = bs[np.repeat(lo, reps) + offs]
        return pd.DataFrame({bucket_col: wb, distinct_col: x[idx]})

    fanned = carr.map_batches(fan_out, batch_format="pandas")
    return grouped_count_distinct(fanned, bucket_col, distinct_col,
                                  out_col=out_col)
