"""Sorted-block grouped scan — a custom operator replacing
``groupby(key).map_groups(fn)`` when there are MANY small groups.

Ray's ``map_groups`` invokes Python once per group; at thousands of
collision buckets that is pure scheduling/interpreter overhead.  This
operator instead:

1. range-partitions by ``ds.sort(key)`` (one all-to-all, C-path);
2. scans each sorted block with ONE ``map_batches`` call, splitting the
   block into complete groups via numpy boundary detection and calling
   ``group_fn`` per group with plain slicing (micro-seconds, no task);
3. groups that may straddle a block edge (the first and last key of every
   block) are passed through as boundary rows and re-scanned once on the
   driver — bounded by 2 groups × block count × group size, i.e. tiny.

Partitioning assumption (documented per SURVEY.md "custom operators"):
``group_fn`` must be insensitive to intra-group row order; boundary groups
are scanned exactly once (blocks drop them, the driver pass owns them).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def scan_sorted_groups(ds, key: str, group_fn, out_empty: pd.DataFrame,
                       min_group: int = 2):
    """Returns (results_dataset, boundary_results_df).

    ``group_fn(g: pd.DataFrame) -> pd.DataFrame`` with columns matching
    ``out_empty``; groups smaller than ``min_group`` are skipped (the
    default 2 fits pair ops — no pair can exist in a singleton; per-group
    transforms like sessionization pass ``min_group=1``).
    """
    out_cols = list(out_empty.columns)

    def scan_block(df: pd.DataFrame) -> pd.DataFrame:
        res_frames: list[pd.DataFrame] = []
        if len(df):
            keys = df[key].to_numpy()
            bmask = (keys == keys[0]) | (keys == keys[-1])
            interior = df[~bmask]
            if len(interior):
                ikeys = interior[key].to_numpy()
                bounds = np.flatnonzero(ikeys[1:] != ikeys[:-1]) + 1
                starts = np.concatenate([[0], bounds])
                ends = np.concatenate([bounds, [len(interior)]])
                for s, e in zip(starts.tolist(), ends.tolist()):
                    if e - s >= min_group:
                        r = group_fn(interior.iloc[s:e])
                        if len(r):
                            res_frames.append(r)
            boundary = df[bmask]
        else:
            boundary = df
        res = (
            pd.concat(res_frames, ignore_index=True)
            if res_frames
            else out_empty.copy()
        )
        res["__boundary__"] = np.zeros(len(res), dtype=np.int8)
        # boundary rows: original input columns, with result columns nulled
        b = boundary.copy()
        for c in out_cols:
            if c not in b.columns:
                b[c] = None
        b["__boundary__"] = np.ones(len(b), dtype=np.int8)
        # result rows need the input columns too (nulled) for schema union
        for c in b.columns:
            if c not in res.columns:
                res[c] = None
        return pd.concat([res, b[res.columns]], ignore_index=True)

    scanned = ds.sort(key).map_batches(
        scan_block, batch_format="pandas", batch_size=None
    ).materialize()

    results = scanned.filter(expr="__boundary__ == 0")
    bdf = scanned.filter(expr="__boundary__ == 1").to_pandas()
    if "__boundary__" in bdf.columns:
        # group_fn must never see the internal marker (a passthrough-style
        # group_fn would leak it into its output)
        bdf = bdf.drop(columns="__boundary__")
    boundary_results = out_empty.copy()
    if len(bdf):
        frames = []
        for _, g in bdf.groupby(key, sort=False):
            if len(g) >= min_group:
                r = group_fn(g)
                if len(r):
                    frames.append(r)
        if frames:
            boundary_results = pd.concat(frames, ignore_index=True)
    input_cols = [c for c in bdf.columns if c not in out_cols]
    results = results.drop_columns(["__boundary__"] + [c for c in input_cols])
    return results, boundary_results
