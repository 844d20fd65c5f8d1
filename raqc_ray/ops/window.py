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


def grouped_ntile(ds, key: str, order_by: str, n_tiles: int,
                  tiebreak: str | None = None, out_col: str = "tile"):
    """Per-key NTILE: appends ``out_col`` (int64, 1-based) bucketing
    each key's rows into ``n_tiles`` near-equal groups in ``(order_by,
    tiebreak)`` order — SQL ``NTILE(n) OVER (PARTITION BY key ORDER BY
    order_by, tiebreak)`` semantics (the first ``n_rows % n_tiles``
    buckets take the extra row).  Same one-sort + sorted-group-scan
    plan as :func:`grouped_running`; ``tiebreak`` must make the order
    total or bucket boundaries are nondeterministic."""
    out_empty = arrow_schema(ds).empty_table().to_pandas()
    out_empty[out_col] = pd.Series(dtype="int64")
    out_cols = list(out_empty.columns)
    sort_cols = [order_by] + ([tiebreak] if tiebreak else [])

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.sort_values(sort_cols, kind="mergesort")
             .reset_index(drop=True))
        n = len(s)
        base, rem = divmod(n, n_tiles)
        # bucket sizes: rem buckets of (base+1), then (n_tiles-rem) of base
        sizes = np.full(min(n_tiles, n), base, dtype=np.int64)
        sizes[:rem] += 1
        s[out_col] = np.repeat(
            np.arange(1, len(sizes) + 1, dtype=np.int64), sizes[sizes > 0])
        return s[out_cols]

    return scan_sorted_groups(ds, key, group_fn, out_empty, min_group=1)


def grouped_lead_lag(ds, key: str, order_by: str, value_col: str,
                     tiebreak: str | None = None,
                     lag_col: str = "lag_value",
                     lead_col: str = "lead_value"):
    """Per-key LAG/LEAD of ``value_col`` in ``(order_by, tiebreak)``
    order — SQL ``LAG(v) OVER`` / ``LEAD(v) OVER`` semantics (null at
    each key's edges).  Same one-sort + sorted-group-scan plan as
    :func:`grouped_running`; the per-group shift is one vectorized
    slice."""
    out_empty = arrow_schema(ds).empty_table().to_pandas()
    out_empty[lag_col] = pd.Series(dtype="float64")
    out_empty[lead_col] = pd.Series(dtype="float64")
    out_cols = list(out_empty.columns)
    sort_cols = [order_by] + ([tiebreak] if tiebreak else [])

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.sort_values(sort_cols, kind="mergesort")
             .reset_index(drop=True))
        v = s[value_col].to_numpy(dtype=np.float64)
        lag = np.full(len(s), np.nan)
        lead = np.full(len(s), np.nan)
        if len(s) > 1:
            lag[1:] = v[:-1]
            lead[:-1] = v[1:]
        s[lag_col] = lag
        s[lead_col] = lead
        return s[out_cols]

    return scan_sorted_groups(ds, key, group_fn, out_empty, min_group=1)


def hopping_window(ds, ts_col: str, value_col: str, window: str, hop: str,
                   round_to: int = 4):
    """Sliding/hopping window aggregate: one output row per window
    start ``(window_start, n_events, sum_value)``; each input row lands
    in ``window/hop`` windows.  ``window`` must be a multiple of
    ``hop`` (both pandas offset strings, e.g. ``"2h"``/``"1h"``).

    Scale plan: the fan-out never leaves its block — a per-block
    combiner assigns each row its k covering window starts and
    pre-aggregates ``(start → n, Σv)`` locally, so the hash ``groupby``
    moves (windows × blocks) partial rows, not k× the event stream.
    This is the streaming-window shape (tumbling = window == hop, see
    q23) generalized to overlap.
    """
    import pyarrow as pa

    from ray.data.aggregate import Sum

    w_us = int(pd.Timedelta(window).value // 1000)
    h_us = int(pd.Timedelta(hop).value // 1000)
    if w_us % h_us:
        raise ValueError("window must be a multiple of hop")
    k = w_us // h_us

    def block_partials(b: pa.Table) -> pd.DataFrame:
        ts = b[ts_col].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        anchor = (ts // h_us) * h_us  # latest window start covering ts
        starts = (anchor[:, None]
                  - np.arange(k, dtype=np.int64)[None, :] * h_us).ravel()
        vals = np.repeat(v, k)
        df = pd.DataFrame({"window_start": starts, "n_events": 1,
                           "sum_value": vals})
        p = df.groupby("window_start", sort=False, as_index=False).sum()
        p["n_events"] = p["n_events"].astype("int64")
        return p

    agg = (ds.map_batches(block_partials, batch_format="pyarrow")
           .groupby("window_start")
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("sum_value", alias_name="sum_value")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "window_start": df["window_start"].astype("int64")
            .to_numpy().astype("datetime64[us]"),
            "n_events": df["n_events"].astype("int64"),
            "sum_value": df["sum_value"].astype("float64").round(round_to),
        })
        return d

    return agg.map_batches(finish, batch_format="pandas")


def grouped_running(ds, key: str, order_by: str, value_col: str,
                    tiebreak: str | None = None, round_to: int = 4):
    """Returns one Dataset. Every input column is preserved; appends ``row_number`` (int64,
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


def grouped_rank(ds, key: str, order_by: str):
    """Per-key RANK / DENSE_RANK / PERCENT_RANK over ``order_by``
    ascending, with SQL tie semantics (tied rows share a rank; RANK
    leaves gaps, DENSE_RANK does not; PERCENT_RANK = (rank-1)/(n-1),
    0.0 for singleton keys).  Returns one Dataset, same contract as
    :func:`grouped_running`.

    Determinism with ties: the three rank columns are functions of the
    VALUE, not the row position, so tied rows get identical outputs and
    no tiebreak column is needed for a hash-stable result.  The
    PERCENT_RANK division is exact-int / exact-int → the same IEEE
    double the SQL engine computes.

    Same one-sort + sorted-group-scan plan as :func:`grouped_ntile`;
    partitioning assumption: one key's rows fit a worker block (a hot
    key spanning blocks is re-dispatched as a distributed boundary
    group, never materialized on the driver).
    """
    out_empty = arrow_schema(ds).empty_table().to_pandas()
    out_empty["rank"] = pd.Series(dtype="int64")
    out_empty["dense_rank"] = pd.Series(dtype="int64")
    out_empty["pct_rank"] = pd.Series(dtype="float64")
    out_cols = list(out_empty.columns)

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.sort_values(order_by, kind="mergesort")
             .reset_index(drop=True))
        v = s[order_by].to_numpy()
        n = len(s)
        # v is sorted: rank(i) = 1 + #values strictly below v[i]
        rank = np.searchsorted(v, v, side="left") + 1
        s["rank"] = rank.astype(np.int64)
        new_val = np.concatenate([[True], v[1:] != v[:-1]])
        s["dense_rank"] = np.cumsum(new_val).astype(np.int64)
        s["pct_rank"] = ((rank - 1) / (n - 1) if n > 1
                         else np.zeros(n, dtype=np.float64))
        return s[out_cols]

    return scan_sorted_groups(ds, key, group_fn, out_empty, min_group=1)


def grouped_rolling(ds, key: str, order_by: str, value_col: str,
                    frame_rows: int, tiebreak: str | None = None,
                    sum_col: str = "roll_sum", avg_col: str = "roll_avg"):
    """Per-key trailing window-frame aggregate — SQL ``SUM/AVG(v) OVER
    (PARTITION BY key ORDER BY order_by ROWS BETWEEN frame_rows-1
    PRECEDING AND CURRENT ROW)``.  ``value_col`` must be int64 so the
    frame sums are exact and the average is the same single IEEE
    division the SQL engine performs (frame count is exact by
    construction).  Same one-sort + sorted-group-scan plan as
    :func:`grouped_running`; the per-group frame sum is one cumsum and
    one shifted subtraction.  Returns one Dataset."""
    out_empty = arrow_schema(ds).empty_table().to_pandas()
    out_empty[sum_col] = pd.Series(dtype="int64")
    out_empty[avg_col] = pd.Series(dtype="float64")
    out_cols = list(out_empty.columns)
    sort_cols = [order_by] + ([tiebreak] if tiebreak else [])

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.sort_values(sort_cols, kind="mergesort")
             .reset_index(drop=True))
        v = s[value_col].to_numpy(dtype=np.int64)
        n = len(s)
        cum = np.cumsum(v)
        roll = cum.copy()
        if n > frame_rows:
            roll[frame_rows:] = cum[frame_rows:] - cum[:-frame_rows]
        cnt = np.minimum(np.arange(1, n + 1, dtype=np.int64), frame_rows)
        s[sum_col] = roll
        s[avg_col] = roll / cnt
        return s[out_cols]

    return scan_sorted_groups(ds, key, group_fn, out_empty, min_group=1)


def grouped_rolling_time(ds, key: str, ts_col: str, value_col: str,
                         window: str, sum_col: str = "roll_sum"):
    """Per-key time-RANGE trailing frame sum — SQL ``SUM(v) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN <window> PRECEDING AND
    CURRENT ROW)``.

    ``value_col`` must be int64 (cents discipline — exact associative
    frame sums).  Unlike the ROWS frame (:func:`grouped_rolling`) no
    tiebreak is needed: equal-``ts`` rows are frame PEERS — every peer's
    frame is the identical interval ``[ts - window, ts]`` (computed by
    two ``searchsorted`` passes against the group's sorted timestamp
    array, not by row position), so the result is intra-group
    order-insensitive by construction.  ``window`` is a pandas offset
    string ("1h") or ``pd.Timedelta``.  Same one-sort +
    sorted-group-scan plan as :func:`grouped_rolling`; per group the
    frame sum is one prefix sum and two binary-search vectors.

    RAQC analog: none (SURVEY §2.6); the trailing-time-window feature
    op of the training-data surface (per-user activity in the last
    hour/day attached to every event).
    """
    win_us = int(pd.Timedelta(window).value // 1000)  # ns → µs
    out_empty = arrow_schema(ds).empty_table().to_pandas()
    out_empty[sum_col] = pd.Series(dtype="int64")
    out_cols = list(out_empty.columns)

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.sort_values(ts_col, kind="mergesort")
             .reset_index(drop=True))
        ts = s[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = s[value_col].to_numpy(dtype=np.int64)
        cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(v)])
        hi = np.searchsorted(ts, ts, side="right")
        lo = np.searchsorted(ts, ts - win_us, side="left")
        s[sum_col] = cum[hi] - cum[lo]
        return s[out_cols]

    return scan_sorted_groups(ds, key, group_fn, out_empty, min_group=1)


def grouped_cume_dist(ds, key: str, value_col: str,
                      scale: int = 1_000_000, out_col: str = "cume"):
    """Per-key CUME_DIST as a SCALED INTEGER: appends ``out_col`` =
    ``(#rows with value ≤ this row's value in the key) * scale //
    n_key`` — SQL ``COUNT(*) OVER (PARTITION BY key ORDER BY v)``
    (RANGE frame: ties count together) over ``COUNT(*) OVER
    (PARTITION BY key)``.  Pure int64 arithmetic — unlike
    ``CUME_DIST()`` itself (a double ratio whose ×scale-floor can be
    off by one ulp), this form hashes bit-identically to the SQL
    oracle under any layout.

    Same one-sort + vectorized sorted-group-scan plan as
    :func:`grouped_running`; within a block one stable sort by
    ``(key, value)`` re-orders every segment in place and the
    ties-inclusive rank is a reverse-propagated run-end index —
    no per-group Python.
    """
    out_empty = arrow_schema(ds).empty_table().to_pandas()
    out_empty[out_col] = pd.Series(dtype="int64")
    out_cols = list(out_empty.columns)

    def _cume(v: np.ndarray, seg_start: np.ndarray,
              seg_end: np.ndarray, same_seg: np.ndarray) -> np.ndarray:
        """ties-inclusive rank scaled, for value-sorted rows.
        ``same_seg[i]`` = rows i and i+1 share a segment."""
        n = len(v)
        # run = maximal (segment, value) streak; run end index per row
        diff = np.ones(n, dtype=bool)
        if n > 1:
            diff[:-1] = ~same_seg | (v[1:] != v[:-1])
        # each row's run END = the nearest diff-marked index at or
        # after it: reverse cumulative MIN over sentinel-filled indices
        idx = np.arange(n, dtype=np.int64)
        cand = np.where(diff, idx, np.int64(n))
        last = np.minimum.accumulate(cand[::-1])[::-1]
        cnt_le = last + 1 - seg_start
        n_seg = seg_end - seg_start
        return (cnt_le * np.int64(scale)) // n_seg

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(value_col, kind="mergesort").reset_index(drop=True)
        n = len(s)
        v = s[value_col].to_numpy()
        same = np.ones(max(n - 1, 0), dtype=bool)
        s[out_col] = _cume(v, np.zeros(n, dtype=np.int64),
                           np.full(n, n, dtype=np.int64), same)
        return s[out_cols]

    def block_fn(interior: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        s = (interior.sort_values([key, value_col], kind="mergesort")
             .reset_index(drop=True))
        n = len(s)
        seg_id = np.zeros(n, dtype=np.int64)
        seg_id[starts[1:]] = 1
        seg_id = np.cumsum(seg_id)
        kk = s[key].to_numpy()
        same_seg = kk[1:] == kk[:-1] if n > 1 else np.zeros(0, dtype=bool)
        v = s[value_col].to_numpy()
        s[out_col] = _cume(v, starts[seg_id], ends[seg_id], same_seg)
        return s[out_cols]

    return scan_sorted_groups(ds, key, group_fn, out_empty, min_group=1,
                              block_fn=block_fn)


def grouped_running_distinct(ds, key: str, value_col: str,
                             order_by: str, tiebreak: str,
                             out_col: str = "distinct_so_far"):
    """Per-key RUNNING DISTINCT COUNT: appends ``out_col`` (int64) =
    number of distinct ``value_col`` values seen in the key's rows up
    to and including this row, in ``(order_by, tiebreak)`` total order
    — the vocabulary-growth / exploration-breadth curve (how many
    distinct event types has this user touched so far).

    SQL cannot window COUNT(DISTINCT); the equivalent is the
    first-occurrence-flag composition the oracle replays:
    ``ROW_NUMBER() OVER (PARTITION BY key, value ORDER BY order_by,
    tiebreak) = 1`` summed by a running ``SUM() OVER (PARTITION BY
    key ORDER BY ...)``.  Exact int64 — hash-stable under any layout.

    Same one-sort + vectorized sorted-group-scan plan as
    :func:`grouped_running`; within a block ONE extra lexsort by
    ``(key, value, order, tiebreak)`` marks first occurrences for
    every group at once, and the per-key cumsum is a segment-offset
    subtraction — no per-group Python, no per-key set state.
    Partitioning contract as the rest of the family (hot boundary
    keys re-dispatched, never driver-materialized).

    RAQC analog: none in SURVEY §2 — §2 training-data surface
    (dedup-curve / coverage-saturation diagnostics over a stream).
    """
    out_empty = arrow_schema(ds).empty_table().to_pandas()
    out_empty[out_col] = pd.Series(dtype="int64")
    out_cols = list(out_empty.columns)

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.sort_values([order_by, tiebreak], kind="mergesort")
             .reset_index(drop=True))
        flags = (~s[value_col].duplicated()).to_numpy()
        s[out_col] = np.cumsum(flags).astype(np.int64)
        return s[out_cols]

    def block_fn(interior: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        s = (interior.sort_values([key, order_by, tiebreak],
                                  kind="mergesort")
             .reset_index(drop=True))
        n = len(s)
        k = s[key].to_numpy()
        v, _ = pd.factorize(s[value_col], sort=False)
        # first occurrence of each (key, value) pair in scan order:
        # lexsort brings equal pairs together preserving scan order
        # (np.lexsort is stable), so a pair's first row is the head
        # of its run
        order2 = np.lexsort((np.arange(n), v, _key_codes(k)))
        kk, vv = k[order2], v[order2]
        head = np.ones(n, dtype=bool)
        if n > 1:
            head[1:] = (kk[1:] != kk[:-1]) | (vv[1:] != vv[:-1])
        flags = np.zeros(n, dtype=np.int64)
        flags[order2[head]] = 1
        # grouped cumsum via segment-offset subtraction
        total = np.cumsum(flags)
        prior = total[starts] - flags[starts]
        sizes = (ends - starts).astype(np.int64)
        s[out_col] = total - np.repeat(prior, sizes)
        return s[out_cols]

    return scan_sorted_groups(ds, key, group_fn, out_empty,
                               min_group=1, block_fn=block_fn)


def _key_codes(k: np.ndarray) -> np.ndarray:
    """int codes for lexsort when the key column may be non-numeric."""
    if np.issubdtype(k.dtype, np.number):
        return k
    return pd.factorize(k, sort=False)[0]
