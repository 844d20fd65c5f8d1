"""Distributed interval (range) join — a custom operator Ray Data
lacks natively.

Emit every (left, right) pair sharing an equality key whose timestamps
satisfy ``lower <= left_ts - right_ts <= upper`` (e.g. "each event
paired with every order the same user placed in the 30 days before
it"). A band-limited theta join: the equality key bounds the candidate
set, the time band bounds it again, so output stays near-linear
instead of the full cross product.

Ray-Data-first plan (SURVEY.md "custom operators" route (a); same
skeleton as :mod:`raqc_ray.ops.asof`):

1. :func:`raqc_ray.ops._join_util.tagged_union` — one tagged stream,
   typed nulls, zero-copy Arrow pads;
2. ONE ``sort`` by the equality key (the only all-to-all);
3. per key group: rights sort by ``right_ts`` once, then BOTH band
   edges resolve for all lefts with two vectorized
   ``np.searchsorted`` calls; pairs materialize with the standard
   repeat/offset trick (no Python loop over rows — one loop per
   *group* only to build frames).

Partitioning assumption (custom-operator contract): one key's history
fits a worker block; hot keys should be time-bucketed by the caller
(bucket by coarse window, join per bucket with a band-width overlap).
Inner semantics: lefts with no right in band produce no row.

RAQC analog: none; part of the §2 "large-scale training-data pipeline"
surface (temporal correlation of event streams with side tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ._join_util import tagged_union
from .groupscan import scan_sorted_groups


def interval_join(left_ds, right_ds, on: str, left_ts: str,
                  right_ts: str, lower, upper,
                  right_on: str | None = None):
    """Inner band join: keeps pairs with
    ``lower <= left_ts - right_ts <= upper`` (both inclusive; pass
    ``lower=0`` for "right at or before left"). ``lower``/``upper``
    are ``pd.Timedelta``-coercible (or plain numbers for numeric ts).
    """
    right_on = right_on or on
    try:
        lower = np.timedelta64(pd.Timedelta(lower))
        upper = np.timedelta64(pd.Timedelta(upper))
    except (ValueError, TypeError):
        pass  # numeric timestamp columns
    union, out_schema, _cols, left_cols, right_payload = tagged_union(
        left_ds, right_ds, on, right_on
    )
    out_empty = out_schema.empty_table().to_pandas()

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        side = g["__side__"].to_numpy()
        r = g[side == 0]
        lf = g[side == 1]
        if not len(r) or not len(lf):
            return out_empty.iloc[0:0]
        r = r.sort_values(right_ts, kind="mergesort")
        rts = r[right_ts].to_numpy()
        lts = lf[left_ts].to_numpy()
        # band: left_ts - upper <= right_ts <= left_ts - lower
        lo = np.searchsorted(rts, lts - upper, side="left")
        hi = np.searchsorted(rts, lts - lower, side="right")
        counts = hi - lo
        m = counts > 0
        if not m.any():
            return out_empty.iloc[0:0]
        counts = counts[m]
        total = int(counts.sum())
        lidx = np.repeat(np.flatnonzero(m), counts)
        # right indices: per-left contiguous ranges [lo, hi) flattened
        starts = np.repeat(lo[m], counts)
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(counts[:-1])]), counts
        )
        ridx = starts + offs
        lm = lf.iloc[lidx].reset_index(drop=True)
        rm = r.iloc[ridx].reset_index(drop=True)
        out = {c: lm[c] for c in left_cols}
        for c in right_payload:
            out[c] = rm[c]
        return pd.DataFrame(out)

    return scan_sorted_groups(union, on, group_fn, out_empty,
                              out_schema=out_schema)
