"""Shared machinery for the ONE-exchange grouped value-histogram plan
(VERDICT r4 #1 — the port template born in
``quantile_exact.grouped_quantile_cont_num``).

The slow plan these helpers replace was: per-block ``(key, value) →
count`` partials → a global hash ``groupby([key, value]).aggregate``
(an exchange over keys × distinct-values groups — 10^7+ rows when
values are high-cardinality; measured >560 s vs 3.3 s at 10M rows /
100k keys, BASELINE.md round-4 session-h) → ``groupby(key)
.map_groups`` (one Python TASK per key — millions of tasks at corpus
scale).

The fast plan: per-block partials feed
:func:`raqc_ray.ops.groupscan.scan_sorted_groups` DIRECTLY — ONE
range-partitioning sort of the histogram-sized partial stream, then a
vectorized ``block_fn`` that processes EVERY key of a sorted block in
a single numpy pass.  Partial rows for the same ``(key, value)`` from
different blocks arrive unmerged; each op either tolerates duplicates
(rank-crossing selections: the count cumsum crosses a rank target at
the same value regardless of how its count is split) or merges them
with :func:`merge_runs` (per-distinct-value statistics: entropy, mode,
ranks).  The helpers here are the shared gather / in-segment value
sort / run-merge steps; each op supplies its own vectorized epilogue.

Layout guarantee: after ``np.lexsort((value, segid))`` every segment's
rows are value-ascending with equal values adjacent, so merged runs
and rank cumsums are bit-identical across block layouts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def key_pandas_dtype(ds, key: str):
    """Pandas dtype of ``key`` derived from the INPUT Dataset's Arrow
    schema (cheap — parquet metadata or an already-materialized block;
    asking a downstream aggregate for its schema would execute it)."""
    from ._join_util import arrow_schema

    return (pa.schema([arrow_schema(ds).field(key)])
            .empty_table().to_pandas()[key].dtype)


def gather_segments(starts: np.ndarray, ends: np.ndarray):
    """Flat gather plan for the qualifying segments of a sorted block:
    ``(idx, segid, sizes, cum_excl)`` where ``idx`` indexes the block
    frame, ``segid`` labels each gathered row with its segment ordinal,
    ``sizes`` are segment lengths and ``cum_excl`` the exclusive cumsum
    (= each segment's first offset in gathered space)."""
    sizes = (ends - starts).astype(np.int64)
    total = int(sizes.sum())
    cum_excl = np.cumsum(sizes) - sizes
    idx = (np.arange(total, dtype=np.int64)
           - np.repeat(cum_excl, sizes) + np.repeat(starts, sizes))
    segid = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
    return idx, segid, sizes, cum_excl


def merge_runs(segid: np.ndarray, v: np.ndarray, *counts: np.ndarray):
    """Merge adjacent equal-``(segid, v)`` runs (input must already be
    ``lexsort((v, segid))``-ordered): returns ``(run_starts, seg_m,
    v_m, counts_m...)`` with each count column summed per run via
    ``np.add.reduceat``.  Works for numeric and object-dtype ``v``."""
    n = len(v)
    if n == 0:
        return (np.zeros(0, dtype=np.int64), segid, v,
                *[c for c in counts])
    new = np.ones(n, dtype=bool)
    new[1:] = (segid[1:] != segid[:-1]) | (v[1:] != v[:-1])
    rs = np.flatnonzero(new)
    merged = tuple(np.add.reduceat(c, rs) for c in counts)
    return (rs, segid[rs], v[rs], *merged)


def seg_bounds_of(segid: np.ndarray, n_segs: int):
    """(starts, sizes) of each segment ordinal inside a (possibly
    merged) segid-sorted array; segments absent from ``segid`` get
    size 0.  ``segid`` must be non-decreasing."""
    starts = np.searchsorted(segid, np.arange(n_segs, dtype=np.int64),
                             side="left")
    ends = np.searchsorted(segid, np.arange(n_segs, dtype=np.int64),
                           side="right")
    return starts, (ends - starts).astype(np.int64)


def grouped_sums(ds, key, cols, out_dtypes=None):
    """Per-key int64 column sums via the ONE-sort sorted-block plan —
    the replacement for ``groupby(key).aggregate(Sum...)`` on
    partial-row streams: Ray's native hash aggregate pays Python-level
    per-group cost when keys span many blocks (measured 141 s for
    1.28M pandas-block partial rows / 20k keys / 4 Sums — vs ~1.2 s
    for this plan, BASELINE.md round-5).  ``ds`` is typically a
    keys × blocks partial stream; ``cols`` are summed exactly (int64,
    associative, layout-invariant).  ``key`` may be a single column
    name or a list (composite keys sort together).  Returns one row
    per key with columns ``[*keys, *cols]``."""
    import numpy as np
    import pandas as pd

    from .groupscan import scan_sorted_groups

    keys = [key] if isinstance(key, str) else list(key)
    cols = list(cols)

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({**{k: [g[k].iloc[0]] for k in keys},
                             **{c: [np.int64(g[c].sum())]
                                for c in cols}})

    def block_fn(df: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        idx, segid, sizes, cum_excl = gather_segments(starts, ends)
        row = {k: df[k].to_numpy()[starts] for k in keys}
        for c in cols:
            row[c] = np.add.reduceat(
                df[c].to_numpy(dtype=np.int64)[idx], cum_excl)
        return pd.DataFrame(row)

    out_empty = pd.DataFrame({
        **{k: pd.Series(dtype=key_pandas_dtype(ds, k)) for k in keys},
        **{c: pd.Series(dtype="int64") for c in cols}})
    return scan_sorted_groups(ds, keys, group_fn, out_empty,
                              min_group=1, block_fn=block_fn)


def assert_headroom(max_abs: int, multiplier: int, op: str,
                    bound: int = 2 ** 62):
    """Loud error instead of silent int64 overflow: asserts
    ``max_abs · multiplier < bound`` (2^62 leaves a 2× safety factor
    under int64).  Call with the largest absolute value entering an
    int64 product/sum and the worst-case count it is multiplied /
    summed over (VERDICT r4 #8 — centralizes the per-op headroom
    bounds documented in TWAP / covariance / banding)."""
    if max_abs and multiplier and int(max_abs) * int(multiplier) >= bound:
        raise OverflowError(
            f"{op}: int64 headroom exceeded (max|value|={max_abs} x "
            f"n={multiplier} >= 2^62); rescale the measure or shard "
            "the key")
