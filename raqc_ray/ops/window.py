"""Per-key ordered window functions (running sum / row number / lag
gap) — the ``SUM(v) OVER (PARTITION BY k ORDER BY ts)`` family as a
distributed operator.

Ray-Data-first plan (SURVEY.md "custom operators" route (a), same
skeleton as :mod:`raqc_ray.ops.sessions`): ONE ``sort`` by key (the
only all-to-all) + one :func:`scan_sorted_groups` pass with
``min_group=1``. Per group the scan is fully vectorized — stable sort
by ``(order_by, tiebreak)``, ``np.cumsum`` for the running sum, one
shifted diff for the lag gap. Unlike sessionization the output is
per-ROW (every input row survives with window columns appended), so
this is the pattern for any rank/lag/lead/cumulative feature a
training-data pipeline derives per user/document stream.

Determinism: ``tiebreak`` must be unique within a key; the running sum
is rounded per row (``round_to``) so output matches the SQL window
oracle bit-for-bit despite floating-point association differences
between ``np.cumsum`` and a segment-tree window aggregator.

Partitioning assumption: one key's full history fits a worker block
(same contract as :mod:`raqc_ray.ops.asof`); hot keys should be
time-bucketed by the caller with a carried-in running total.

RAQC analog: none (SURVEY §2.6 — the reference has no window
functions); part of the §2 "large-scale training-data pipeline"
surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ._join_util import arrow_schema
from .groupscan import scan_sorted_groups


def grouped_running(ds, key: str, order_by: str, value_col: str,
                    tiebreak: str | None = None, round_to: int = 4):
    """Returns (res_dataset, boundary_df) — caller unions.

    Every input column is preserved; appends ``row_number`` (int64,
    1-based per key in ``(order_by, tiebreak)`` order), ``running_sum``
    (float64 cumulative sum of ``value_col``, rounded to ``round_to``)
    and ``gap_ms`` (float64 milliseconds since the key's previous row,
    NaN on each key's first row; plain numeric difference when
    ``order_by`` is not a datetime).
    """
    out_empty = arrow_schema(ds).empty_table().to_pandas()
    out_empty["row_number"] = pd.Series(dtype="int64")
    out_empty["running_sum"] = pd.Series(dtype="float64")
    out_empty["gap_ms"] = pd.Series(dtype="float64")
    out_cols = list(out_empty.columns)
    sort_cols = [order_by] + ([tiebreak] if tiebreak else [])

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.sort_values(sort_cols, kind="mergesort")
             .reset_index(drop=True))
        n = len(s)
        t = s[order_by].to_numpy()
        s["row_number"] = np.arange(1, n + 1, dtype=np.int64)
        s["running_sum"] = np.round(
            np.cumsum(s[value_col].to_numpy(dtype=np.float64)), round_to
        )
        gap = np.full(n, np.nan)
        if n > 1:
            d = t[1:] - t[:-1]
            if np.issubdtype(d.dtype, np.timedelta64):
                d = d.astype("timedelta64[us]").astype(np.int64) / 1000.0
            gap[1:] = d
        s["gap_ms"] = gap
        return s[out_cols]

    return scan_sorted_groups(ds, key, group_fn, out_empty, min_group=1)
