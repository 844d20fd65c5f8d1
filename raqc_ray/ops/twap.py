"""Per-key time-weighted average (TWAP) — the piecewise-constant
integral of a value over each key's event timeline, divided by the
span — in EXACT integer (µs x cents) arithmetic.

For a key's events sorted by ``(ts, id)`` (the tiebreak makes
zero-duration runs deterministic)::

    twap = floor( sum_i v_i * (t_{i+1} - t_i)  /  (t_last - t_first) )

with ``v = floor(value*scale + 0.5)`` int64 and ``t`` in integer
microseconds; the last event carries no duration.  Every product and
sum is int64 / Python-int exact, so the result is bit-identical
across block layouts and matches a LEAD-window HUGEINT SQL oracle
with mod-emulated floor division.

Plan: ONE ``ds.sort(key)`` + sorted-block scan
(`ops/groupscan.scan_sorted_groups`); inside each block one stable
re-sort by ``(key, ts, id)``, one ``np.diff`` (zeroed at segment
edges), one elementwise product, and per-segment ``add.reduceat``
sums — one output row per key, no per-group task anywhere.  Keys
with a single event or zero span emit nothing.

Overflow bound: ``max(|v_scaled|) * span_us < 2^63`` per key (cents
scale holds ~$9.2e13-µs-dollar products — e.g. |v| <= $10^4 over a
29-year span).  Raise ``scale`` concerns upstream past that; the SQL
oracle uses HUGEINT throughout.

RAQC analog: none — SURVEY §2 training-data surface (sensor/price
telemetry summarization; complements the hourly OHLC bars q132 and
forward-fill resampling q134, which bucket time rather than
integrate it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["grouped_twap"]


def _floor_div(a: int, b: int) -> int:
    return a // b  # Python // floors — the SQL oracle emulates this


def grouped_twap(ds, key: str, ts_col: str, id_col: str,
                 value_col: str, scale: int = 100):
    """Dataset ``(key, span_us, twap)`` — one int64 row per key with
    at least two events and a positive span; ``twap`` is the scaled
    time-weighted mean, ``span_us`` the integer-microsecond extent.
    Null-free input contract (fixture guarantee): callers with
    nullable timestamps/values filter upstream."""
    from ._join_util import arrow_schema
    from .groupscan import scan_sorted_groups
    from .vhist import assert_headroom

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: df[key],
            "__tu": df[ts_col].to_numpy().astype("datetime64[us]")
            .astype(np.int64),
            id_col: df[id_col],
            "__vi": np.floor(
                df[value_col].to_numpy(dtype=np.float64) * scale + 0.5
            ).astype(np.int64),
        })

    pds = ds.map_batches(prep, batch_format="pandas")

    def _emit(kvals, tu, vi, starts, ends):
        if len(vi):
            # documented bound made loud: |Σ v·dt| ≤ max|v|·span
            assert_headroom(int(np.abs(vi).max()),
                            int(tu.max() - tu.min()) or 1,
                            "grouped_twap")
        d = np.zeros(len(tu), dtype=np.int64)
        d[:-1] = tu[1:] - tu[:-1]
        d[ends - 1] = 0  # no duration across segment edges / last row
        c = vi * d
        num = np.add.reduceat(c, starts)
        span = tu[ends - 1] - tu[starts]
        ok = span > 0
        if not ok.any():
            return None
        num, span = num[ok], span[ok]
        # exact per-key floor division in Python ints (int64-safe by
        # the documented bound, but Python ints cost nothing here —
        # one divide per KEY, not per row)
        tw = np.fromiter(
            (_floor_div(int(a), int(b)) for a, b in zip(num, span)),
            dtype=np.int64, count=len(num))
        return pd.DataFrame({key: kvals[starts[ok]],
                             "span_us": span.astype(np.int64),
                             "twap": tw})

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.sort_values(["__tu", id_col], kind="mergesort")
             .reset_index(drop=True))
        r = _emit(s[key].to_numpy(),
                  s["__tu"].to_numpy(dtype=np.int64),
                  s["__vi"].to_numpy(dtype=np.int64),
                  np.array([0], dtype=np.int64),
                  np.array([len(s)], dtype=np.int64))
        return out_empty.copy() if r is None else r

    def block_fn(interior: pd.DataFrame, gs: np.ndarray,
                 ge: np.ndarray) -> pd.DataFrame:
        s = (interior.sort_values([key, "__tu", id_col],
                                  kind="mergesort")
             .reset_index(drop=True))
        kk = s[key].to_numpy()
        n = len(s)
        new = np.ones(n, dtype=bool)
        new[1:] = kk[1:] != kk[:-1]
        # ALL segments go through _emit (its span>0 filter drops the
        # short ones): reduceat bins and edge-zeroing must see every
        # boundary or a dropped segment's rows leak into a neighbor
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        r = _emit(kk, s["__tu"].to_numpy(dtype=np.int64),
                  s["__vi"].to_numpy(dtype=np.int64), starts, ends)
        return out_empty.copy() if r is None else r

    out_empty = (arrow_schema(pds).empty_table().to_pandas()
                 [[key]].copy())
    out_empty["span_us"] = pd.Series(dtype="int64")
    out_empty["twap"] = pd.Series(dtype="int64")
    return scan_sorted_groups(pds, key, group_fn, out_empty,
                              min_group=2, block_fn=block_fn)
