"""Sorted-block grouped scan — a custom operator replacing
``groupby(key).map_groups(fn)`` when there are MANY small groups.

Ray's ``map_groups`` invokes one Python TASK per group; at thousands
(or, for graph rounds, millions) of groups that is pure scheduling and
interpreter overhead.  This operator instead:

1. range-partitions by ``ds.sort(keys)`` (one all-to-all, C-path);
2. scans each sorted block with ONE ``map_batches`` call, splitting the
   block into complete groups via numpy boundary detection and either
   calling ``group_fn`` per group with plain slicing (micro-seconds, no
   task) or — when ``block_fn`` is given — processing EVERY group of
   the block in one vectorized numpy call;
3. groups that may straddle a block edge (the first and last key of
   every block) are routed by SIZE: small boundary sets are re-scanned
   once on the driver (cheap, no extra tasks); an oversize boundary set
   (a hot key spanning many blocks — adversarial skew) is re-dispatched
   as a distributed ``groupby(keys).map_groups`` over the boundary rows
   only, so no group is ever materialized on the driver.  Boundary
   groups are few (≤ 2 per block), which is exactly the regime where
   ``map_groups``' task-per-group cost is irrelevant.

Partitioning assumption (documented per SURVEY.md "custom operators"):
``group_fn`` must be insensitive to intra-group row order; boundary
groups are scanned exactly once (blocks drop them; the boundary pass
owns them).  A single group must fit in one worker's memory — the
irreducible contract of any whole-group semantic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_BMARK = "__boundary__"


def _schema_for(out_empty: pd.DataFrame) -> pa.Schema:
    """Arrow schema of the declared output frame; empty object columns
    (which Arrow infers as null type) are mapped to string."""
    s = pa.Schema.from_pandas(out_empty, preserve_index=False)
    fields = [
        pa.field(f.name, pa.string()) if pa.types.is_null(f.type) else f
        for f in s
    ]
    return pa.schema(fields)


def _segment_bounds(df: pd.DataFrame, keys: list[str]):
    """(starts, ends) of maximal equal-key runs in an already key-sorted
    frame (vectorized over all key columns)."""
    n = len(df)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    change = np.zeros(n - 1, dtype=bool)
    for k in keys:
        a = df[k].to_numpy()
        change |= a[1:] != a[:-1]
    bounds = np.flatnonzero(change) + 1
    starts = np.concatenate([[0], bounds]).astype(np.int64)
    ends = np.concatenate([bounds, [n]]).astype(np.int64)
    return starts, ends


def scan_sorted_groups(ds, key, group_fn, out_empty: pd.DataFrame,
                       min_group: int = 2, block_fn=None,
                       out_schema: pa.Schema | None = None,
                       driver_boundary_limit: int = 200_000):
    """Apply a whole-group function to every key group of ``ds`` and
    return ONE Dataset with exactly ``out_empty``'s columns and types.

    ``key``: one column name or a list (composite keys sort together).
    ``group_fn(g: pd.DataFrame) -> pd.DataFrame`` with columns matching
    ``out_empty``; groups smaller than ``min_group`` are skipped (the
    default 2 fits pair ops — no pair can exist in a singleton;
    per-group transforms like sessionization pass ``min_group=1``).
    ``block_fn(interior_df, starts, ends) -> pd.DataFrame`` (optional):
    vectorized fast path invoked once per sorted block with the
    qualifying segments' offsets; must be emission-equivalent to looping
    ``group_fn`` over the segments (``group_fn`` still handles boundary
    groups).  ``driver_boundary_limit``: boundary row count above which
    the boundary re-scan runs distributed instead of on the driver.
    """
    import ray.data as rd

    keys = [key] if isinstance(key, str) else list(key)
    out_cols = list(out_empty.columns)
    schema = out_schema if out_schema is not None else _schema_for(out_empty)
    in_cols = [c for c in ds.schema().names]

    def scan_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df):
            bmask_first = np.ones(len(df), dtype=bool)
            bmask_last = np.ones(len(df), dtype=bool)
            for k in keys:
                a = df[k].to_numpy()
                bmask_first &= a == a[0]
                bmask_last &= a == a[-1]
            bmask = bmask_first | bmask_last
            interior = df[~bmask]
            res_frames: list[pd.DataFrame] = []
            if len(interior):
                interior = interior.reset_index(drop=True)
                starts, ends = _segment_bounds(interior, keys)
                ok = (ends - starts) >= min_group
                starts, ends = starts[ok], ends[ok]
                if len(starts):
                    if block_fn is not None:
                        r = block_fn(interior, starts, ends)
                        if len(r):
                            res_frames.append(r)
                    else:
                        for s, e in zip(starts.tolist(), ends.tolist()):
                            r = group_fn(interior.iloc[s:e])
                            if len(r):
                                res_frames.append(r)
            boundary = df[bmask]
        else:
            boundary = df
            res_frames = []
        res = (pd.concat(res_frames, ignore_index=True)
               if res_frames else out_empty.copy())
        res[_BMARK] = np.zeros(len(res), dtype=np.int8)
        # boundary rows pass through with result columns nulled; result
        # rows get the input columns nulled — one unioned block schema
        b = boundary.copy()
        for c in out_cols:
            if c not in b.columns:
                b[c] = None
        b[_BMARK] = np.ones(len(b), dtype=np.int8)
        for c in b.columns:
            if c not in res.columns:
                res[c] = None
        return pd.concat([res, b[res.columns]], ignore_index=True)

    scanned = ds.sort(keys).map_batches(
        scan_block, batch_format="pandas", batch_size=None
    ).materialize()
    # Ray's sort emits schema-less EMPTY blocks for empty key ranges and
    # map_batches passes them through without invoking the UDF; they
    # poison any downstream Dataset.join ("no match for key field").
    # Rebuild zero-copy from the surviving block refs (all pandas — the
    # scan_block output) dropping the degenerates.
    keep_refs, total = [], 0
    for bundle in scanned.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            total += 1
            if meta.num_rows:
                keep_refs.append(ref)
    if not keep_refs:
        return rd.from_arrow(schema.empty_table())
    if len(keep_refs) < total:
        scanned = rd.from_pandas_refs(keep_refs)

    def cast(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(df[out_cols], schema=schema,
                                    preserve_index=False)

    results = scanned.filter(expr=f"{_BMARK} == 0").map_batches(
        cast, batch_format="pandas")
    # always union one zero-row block of the declared schema: a scan that
    # matches nothing must still report its schema downstream
    parts = [results, rd.from_arrow(schema.empty_table())]

    bds = scanned.filter(expr=f"{_BMARK} == 1")
    n_boundary = bds.count()
    if n_boundary:
        if n_boundary <= driver_boundary_limit:
            bdf = bds.to_pandas()[in_cols]
            frames = []
            for _, g in bdf.groupby(keys, sort=False):
                if len(g) >= min_group:
                    r = group_fn(g)
                    if len(r):
                        frames.append(r)
            if frames:
                bres = pd.concat(frames, ignore_index=True)
                parts.append(rd.from_arrow(cast(bres)))
        else:
            # skew path: a hot key spanning many blocks never lands on
            # the driver — boundary groups are ≤ 2 per block, so one
            # map_groups task per group is cheap here (few groups), and
            # each runs on a worker with only its own group in memory
            def wrapped(g: pd.DataFrame) -> pa.Table:
                g = g[in_cols]
                if len(g) < min_group:
                    return schema.empty_table()
                r = group_fn(g)
                return cast(r) if len(r) else schema.empty_table()

            parts.append(
                bds.groupby(keys).map_groups(wrapped, batch_format="pandas"))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
