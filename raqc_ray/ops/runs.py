"""Ordered per-key stream compression — gaps-and-islands run-length
encoding (SCD2-style validity segments) and inter-arrival gap stats.

Both are whole-group ordered scans over a key's event stream,
expressed as SURVEY.md "custom operators" route (a): ONE ``sort`` by
key (the only all-to-all) + one :func:`raqc_ray.ops.groupscan
.scan_sorted_groups` pass whose vectorized ``block_fn`` processes
every complete group of a sorted block in a single numpy call — no
task-per-group, no driver materialization (oversize boundary keys
re-dispatch distributed, the groupscan contract).

Determinism: each group is internally re-sorted by ``(ts, tiebreak)``
before scanning, so emission is invariant to block layout; run
boundaries and gap diffs are pure int64 arithmetic on the timestamp's
microsecond representation — bit-identical to the SQL LAG /
gaps-and-islands oracles.

Partitioning assumption: one key's full history fits a worker block
(the :mod:`raqc_ray.ops.sessions` contract); hot keys should be
time-bucketed by the caller with a carry-in segment row.

RAQC analog: none (SURVEY §2.8 covers flag debounce windows); part of
the §2 training-data surface (status-history compaction, event-rate
profiling per entity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .groupscan import scan_sorted_groups


def run_length_segments(ds, key: str, ts: str, state_col: str,
                        tiebreak: str):
    """Collapse each key's (ts, tiebreak)-ordered stream into maximal
    runs of equal ``state_col`` — the gaps-and-islands / SCD2 segment
    table.  Output columns: ``key``, ``run_idx`` (1-based per key in
    time order), ``state_col``, ``start_id`` (the run's first
    ``tiebreak`` value), ``n`` (rows in the run).

    SQL equivalent: the ROW_NUMBER-difference islands trick grouped on
    ``(key, state, rn − rt)`` with ``arg_min(tiebreak, rn)`` as
    ``start_id`` — the q-oracle form.
    """
    out_empty = pd.DataFrame({
        key: pd.Series(dtype="int64"),
        "run_idx": pd.Series(dtype="int64"),
        state_col: pd.Series(dtype="object"),
        "start_id": pd.Series(dtype="int64"),
        "n": pd.Series(dtype="int64"),
    })

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([ts, tiebreak], kind="mergesort")
        st = s[state_col].to_numpy()
        new = np.ones(len(s), dtype=bool)
        new[1:] = st[1:] != st[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(s))
        return pd.DataFrame({
            key: np.full(len(starts), g[key].iloc[0], dtype=np.int64),
            "run_idx": np.arange(1, len(starts) + 1, dtype=np.int64),
            state_col: st[starts],
            "start_id": s[tiebreak].to_numpy(dtype=np.int64)[starts],
            "n": (ends - starts).astype(np.int64),
        })

    def block_fn(interior: pd.DataFrame, gs: np.ndarray,
                 ge: np.ndarray) -> pd.DataFrame:
        # one stable sort covers every group: key asc, then (ts, tie)
        s = interior.sort_values([key, ts, tiebreak], kind="mergesort")
        k = s[key].to_numpy(dtype=np.int64)
        st = s[state_col].to_numpy()
        tie = s[tiebreak].to_numpy(dtype=np.int64)
        n = len(s)
        new = np.ones(n, dtype=bool)
        new[1:] = (st[1:] != st[:-1]) | (k[1:] != k[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        key_new = np.ones(len(starts), dtype=bool)
        key_new[1:] = k[starts[1:]] != k[starts[:-1]]
        # 1-based run index per key: position − position of the key's
        # first run
        first_of_key = np.maximum.accumulate(
            np.where(key_new, np.arange(len(starts)), 0))
        run_idx = np.arange(len(starts)) - first_of_key + 1
        return pd.DataFrame({
            key: k[starts],
            "run_idx": run_idx.astype(np.int64),
            state_col: st[starts],
            "start_id": tie[starts],
            "n": (ends - starts).astype(np.int64),
        })

    return scan_sorted_groups(ds, key, group_fn, out_empty,
                              min_group=1, block_fn=block_fn)


def interarrival_stats(ds, key: str, ts: str, tiebreak: str):
    """Per-key inter-arrival gap statistics over the (ts, tiebreak)
    order: ``(key, n_events, n_gaps, gap_min, gap_max, gap_sum)`` with
    gaps in integer microseconds (int64 timestamp diffs — exact).
    Keys with a single event emit ``n_gaps = 0`` and zero gap stats
    (matching ``COALESCE(…, 0)`` in the LAG oracle)."""
    out_empty = pd.DataFrame({
        key: pd.Series(dtype="int64"),
        "n_events": pd.Series(dtype="int64"),
        "n_gaps": pd.Series(dtype="int64"),
        "gap_min": pd.Series(dtype="int64"),
        "gap_max": pd.Series(dtype="int64"),
        "gap_sum": pd.Series(dtype="int64"),
    })

    def _one(tvals: np.ndarray, kval) -> dict:
        d = np.diff(tvals)
        if len(d):
            return {key: [kval], "n_events": [len(tvals)],
                    "n_gaps": [len(d)], "gap_min": [int(d.min())],
                    "gap_max": [int(d.max())], "gap_sum": [int(d.sum())]}
        return {key: [kval], "n_events": [len(tvals)], "n_gaps": [0],
                "gap_min": [0], "gap_max": [0], "gap_sum": [0]}

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([ts, tiebreak], kind="mergesort")
        t = s[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame(_one(t, g[key].iloc[0]))

    def block_fn(interior: pd.DataFrame, gs: np.ndarray,
                 ge: np.ndarray) -> pd.DataFrame:
        s = interior.sort_values([key, ts, tiebreak], kind="mergesort")
        k = s[key].to_numpy(dtype=np.int64)
        t = s[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(s)
        d = t[1:] - t[:-1]
        same = k[1:] == k[:-1]          # True ⇒ gap d[i] is intra-key
        grp = np.concatenate([[0], np.cumsum(~same)])  # group id / row
        starts = np.concatenate([[0], np.flatnonzero(~same) + 1])
        sizes = np.diff(np.append(starts, n)).astype(np.int64)
        ngroups = len(starts)
        gmin = np.zeros(ngroups, dtype=np.int64)
        gmax = np.zeros(ngroups, dtype=np.int64)
        gsum = np.zeros(ngroups, dtype=np.int64)
        gd = d[same]                    # intra-key gaps, group order
        if len(gd):
            gg = grp[:-1][same]         # owning group of each gap
            seg = np.flatnonzero(
                np.concatenate([[True], gg[1:] != gg[:-1]]))
            owners = gg[seg]
            gmin[owners] = np.minimum.reduceat(gd, seg)
            gmax[owners] = np.maximum.reduceat(gd, seg)
            gsum[owners] = np.add.reduceat(gd, seg)
        return pd.DataFrame({
            key: k[starts], "n_events": sizes,
            "n_gaps": sizes - 1,
            "gap_min": gmin, "gap_max": gmax, "gap_sum": gsum,
        })

    return scan_sorted_groups(ds, key, group_fn, out_empty,
                              min_group=1, block_fn=block_fn)


def burstiness_stats(ds, key: str, ts: str, tiebreak: str,
                     min_gaps: int = 2, round_to: int = 6):
    """Per-key Goh–Barabási burstiness over the inter-arrival gaps:
    ``(key, n_gaps, gap_sum_s, gap_sum2_s, burstiness)`` with gaps
    floored to integer SECONDS (``gap_us // 10**6`` — exact, and keeps
    the Σg² accumulator in int64: a year-long gap is ~3·10⁷ s, so
    ~10⁴ such gaps per key fit; callers with longer spans pick a
    coarser unit).  ``burstiness = (σ−μ)/(σ+μ)`` with the POPULATION
    σ from the exact integer moments — +1 ⇒ maximally bursty, 0 ⇒
    Poisson, −1 ⇒ periodic (Goh & Barabási, EPL 81 (2008) 48002).
    Keys with fewer than ``min_gaps`` gaps are dropped (σ undefined /
    degenerate).  Float epilogue mirrors the SQL oracle's expression
    shape (``GREATEST(var, 0)`` guards the all-equal-gaps case where
    the two-pass identity goes epsilon-negative), rounded ``round_to``.

    Same ONE-sort sorted-block plan and partitioning contract as
    :func:`interarrival_stats` (intra-key gaps only; per-key rows are
    totally ordered by ``(ts, tiebreak)``).

    RAQC analog: none in SURVEY §2 — part of the §2 training-data
    surface (event-stream temporal-quality screen: scraper retry
    storms and replayed logs are bursty; synthetic/beaconed streams
    are periodic)."""
    from ._join_util import arrow_schema

    # key dtype from the input schema (same pattern as
    # cusum.grouped_changepoint) — string keys work in the block path
    key_dtype = (pa.schema([arrow_schema(ds).field(key)])
                 .empty_table().to_pandas()[key].dtype)
    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_dtype),
        "n_gaps": pd.Series(dtype="int64"),
        "gap_sum_s": pd.Series(dtype="int64"),
        "gap_sum2_s": pd.Series(dtype="int64"),
        "burstiness": pd.Series(dtype="float64"),
    })

    def _finish(kvals, n, gs, gs2) -> pd.DataFrame:
        n = np.asarray(n, dtype=np.int64)
        gs = np.asarray(gs, dtype=np.int64)
        gs2 = np.asarray(gs2, dtype=np.int64)
        keep = n >= min_gaps
        kvals = np.asarray(kvals)[keep]
        n, gs, gs2 = n[keep], gs[keep], gs2[keep]
        nf = n.astype(np.float64)
        m = gs / nf
        var = np.maximum(gs2 / nf - m * m, 0.0)
        sd = np.sqrt(var)
        denom = sd + m
        b = np.where(denom > 0.0, (sd - m) / np.where(denom > 0.0,
                                                      denom, 1.0), 0.0)
        return pd.DataFrame({
            key: kvals, "n_gaps": n, "gap_sum_s": gs,
            "gap_sum2_s": gs2,
            "burstiness": np.round(b, round_to),
        })

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([ts, tiebreak], kind="mergesort")
        t = s[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = np.diff(t) // 1_000_000
        return _finish([g[key].iloc[0]], [len(d)],
                       [int(d.sum())], [int((d * d).sum())])

    def block_fn(interior: pd.DataFrame, gs_: np.ndarray,
                 ge_: np.ndarray) -> pd.DataFrame:
        s = interior.sort_values([key, ts, tiebreak], kind="mergesort")
        k = s[key].to_numpy()
        t = s[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(s)
        d = (t[1:] - t[:-1]) // 1_000_000
        same = k[1:] == k[:-1]
        grp = np.concatenate([[0], np.cumsum(~same)])
        starts = np.concatenate([[0], np.flatnonzero(~same) + 1])
        sizes = np.diff(np.append(starts, n)).astype(np.int64)
        ngroups = len(starts)
        gsum = np.zeros(ngroups, dtype=np.int64)
        gsum2 = np.zeros(ngroups, dtype=np.int64)
        gd = d[same]
        if len(gd):
            gg = grp[:-1][same]
            seg = np.flatnonzero(
                np.concatenate([[True], gg[1:] != gg[:-1]]))
            owners = gg[seg]
            gsum[owners] = np.add.reduceat(gd, seg)
            gsum2[owners] = np.add.reduceat(gd * gd, seg)
        return _finish(k[starts], sizes - 1, gsum, gsum2)

    return scan_sorted_groups(ds, key, group_fn, out_empty,
                              min_group=1, block_fn=block_fn)


def suppress_rapid_repeats(ds, keys, ts: str, tiebreak: str,
                           gap_us: int):
    """Stateless debounce: drop a row when the PREVIOUS row of the
    same key group (in ``(ts, tiebreak)`` order) is within ``gap_us``
    microseconds — the LAG-gap filter that strips bursty duplicate
    events before rate/funnel analysis.  The first row of every group
    is always kept.

    NOTE the documented semantics: the gap is measured to the
    immediately preceding EVENT, not to the last KEPT event (the
    stateful variant is an inherently sequential recurrence; this
    stateless form is the SQL-expressible one and the standard
    pre-aggregation filter).  Same ordered-scan plan and partitioning
    contract as :func:`run_length_segments`; emission is the input
    row set filtered, all columns preserved.
    """
    from ._join_util import arrow_schema

    keys = [keys] if isinstance(keys, str) else list(keys)
    out_empty = arrow_schema(ds).empty_table().to_pandas()

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([ts, tiebreak], kind="mergesort")
        t = s[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        keep = np.ones(len(s), dtype=bool)
        keep[1:] = (t[1:] - t[:-1]) > gap_us
        return s[keep]

    return scan_sorted_groups(ds, keys, group_fn, out_empty,
                              min_group=1)
