"""Distributed as-of join — a custom operator Ray Data lacks natively.

For every left row, attach the most recent right row with
``right_ts <= left_ts`` matched per equality key (the classic
point-in-time / "ASOF" join: events → latest prior order, tick →
latest prior quote).

Ray-Data-first plan (SURVEY.md "custom operators" route (a) —
composition of map_batches + sort, no raw actors):

1. harmonize both sides into ONE tagged stream (left payload columns
   null on right rows and vice versa, typed nulls via pyarrow) — two
   ``map_batches`` passes, zero-copy Arrow;
2. ONE ``sort`` by the equality key (the only all-to-all);
3. scan each sorted block with :func:`scan_sorted_groups`: per key
   group, rights are sorted by ``(right_ts, tiebreak)`` and each left
   timestamp resolves via one vectorized ``np.searchsorted`` —
   ``side='right' - 1`` picks the latest eligible right row, and among
   equal ``right_ts`` the greatest ``tiebreak`` (deterministic output
   even when right timestamps collide, equivalent to joining against a
   ``MAX_BY``-deduped right side);
4. groups straddling a block edge re-scan once on the driver
   (groupscan's boundary pass).

Partitioning assumption (documented per the custom-operator contract):
one key's full history must fit in a worker block — true for per-user /
per-symbol histories; a pathological hot key should be time-bucketed by
the caller (bucket the key by coarse time window, join per bucket with
a carry-in row). Inner semantics: left rows with no eligible right row
are dropped (DuckDB ``ASOF JOIN`` default).

RAQC analog: none (the reference aligns rasters by grid cell only);
this is part of the §2 "operations a large-scale training-data
pipeline needs" surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ._join_util import tagged_union
from .groupscan import scan_sorted_groups

# re-exported for ops that need a pyarrow view of any Dataset's schema
from ._join_util import arrow_schema as _arrow_schema  # noqa: F401


def asof_join(left_ds, right_ds, on: str, left_ts: str, right_ts: str,
              right_on: str | None = None, tiebreak: str | None = None,
              tolerance=None):
    """Inner as-of join of two Datasets.

    Returns a Dataset with every left column plus every right column
    except the (renamed) right key. ``tolerance`` (optional
    ``np.timedelta64`` / number) drops matches older than
    ``left_ts - tolerance``.
    """
    right_on = right_on or on
    union, out_schema, out_cols, left_cols, right_payload = tagged_union(
        left_ds, right_ds, on, right_on
    )
    out_empty = out_schema.empty_table().to_pandas()
    rsort = [right_ts] + ([tiebreak] if tiebreak else [])

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        side = g["__side__"].to_numpy()
        r = g[side == 0]
        lf = g[side == 1]
        if not len(r) or not len(lf):
            return out_empty.iloc[0:0]
        r = r.sort_values(rsort, kind="mergesort")
        rts = r[right_ts].to_numpy()
        lts = lf[left_ts].to_numpy()
        idx = np.searchsorted(rts, lts, side="right") - 1
        m = idx >= 0
        if tolerance is not None:
            m &= (lts - rts[np.clip(idx, 0, None)]) <= tolerance
        if not m.any():
            return out_empty.iloc[0:0]
        lm = lf[m].reset_index(drop=True)
        rm = r.iloc[idx[m]].reset_index(drop=True)
        out = {c: lm[c] for c in left_cols}
        for c in right_payload:
            out[c] = rm[c]
        return pd.DataFrame(out)

    return scan_sorted_groups(union, on, group_fn, out_empty,
                              out_schema=out_schema)
