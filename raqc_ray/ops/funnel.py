"""Funnel conversion — the "event A followed by event B within T"
sequence primitive (trigger→action attribution over an event stream).

Ray-Data-first plan (SURVEY.md "custom operators" route (a)): filter to
the two stages at the read (nothing else leaves storage), ONE ``sort``
by key via :func:`raqc_ray.ops.groupscan.scan_sorted_groups`, then a
fully VECTORIZED per-block scan: within each key segment, the last
stage-A timestamp at-or-before every row comes from a C-path grouped
forward-fill (pandas ``groupby(seg).ffill`` — timestamps ascend within
a segment, so ffill IS the running max; no Python per group), and a
stage-B row converts when ``0 ≤ ts − last_A ≤ window``.
Per-key aggregates (first conversion, conversion count) reduce with
``np.minimum.reduceat`` / ``np.add.reduceat``.

Equivalent SQL (the oracle) is the correlated ``EXISTS`` over the two
stage streams; the scan computes the same predicate in one pass.

Determinism: a conversion depends only on the multiset of (ts, type)
rows per key — ties between equal timestamps don't matter because
``ts_A == ts_B`` qualifies regardless of scan order (``Δ = 0`` is
in-window) and the forward-fill over equal ts is order-invariant
(A rows sort first at ties).

Partitioning assumption: one key's stage-A/B history fits a worker
block (same contract as ops/sessions.py); hot keys should be
time-bucketed with a carried last-A timestamp.

RAQC analog: none (SURVEY §2 has no sequence ops); part of the §2
LLM-pipeline/event surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .groupscan import scan_sorted_groups

_NAT = np.datetime64("NaT", "us")


def funnel_conversions(ds, key: str, ts: str, type_col: str,
                       stage_a: str, stage_b: str, window) -> "object":
    """Per-key funnel summary over an event Dataset.

    Returns one row per key that CONVERTED (has ≥ 1 ``stage_b`` event
    within ``window`` after — or simultaneous with — a ``stage_a``
    event): ``(key, conv_ts, n_conversions)`` where ``conv_ts`` is the
    earliest qualifying ``stage_b`` timestamp and ``n_conversions``
    counts qualifying ``stage_b`` events.
    """
    window = np.timedelta64(pd.Timedelta(window))

    two = ds.filter(
        expr=f"{type_col} == '{stage_a}' or {type_col} == '{stage_b}'"
    ).select_columns([key, ts, type_col])

    out_empty = pd.DataFrame({
        key: pd.Series(dtype="int64"),
        "conv_ts": pd.Series(dtype="datetime64[us]"),
        "n_conversions": pd.Series(dtype="int64"),
    })

    def _emit(s: pd.DataFrame, seg: np.ndarray, starts: np.ndarray,
              keys_at_start: np.ndarray) -> pd.DataFrame:
        """Shared emitter over a (ts, type)-sorted frame with segment
        ids; vectorized across ALL segments."""
        t = s[ts].to_numpy(dtype="datetime64[us]")
        is_a = (s[type_col] == stage_a).to_numpy()
        # last stage-A ts at-or-before each row, per segment: rows are
        # ts-ascending within a segment, so a grouped forward-fill of
        # the A timestamps IS the running max (C path, no Python)
        a_ts = pd.Series(np.where(is_a, t, _NAT))
        last_a = a_ts.groupby(seg).ffill().to_numpy(dtype="datetime64[us]")
        is_b = ~is_a & (s[type_col] == stage_b).to_numpy()
        conv = is_b & ~pd.isna(last_a) & ((t - last_a) <= window)
        if not conv.any():
            return out_empty.copy()
        n_conv = np.add.reduceat(conv.astype(np.int64), starts)
        # first qualifying B ts per segment: min over converted rows
        big = np.datetime64("2200-01-01", "us")
        tconv = np.where(conv, t, big)
        first = np.minimum.reduceat(tconv, starts)
        has = n_conv > 0
        return pd.DataFrame({
            key: keys_at_start[has],
            "conv_ts": first[has],
            "n_conversions": n_conv[has],
        })

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        # stage-A rows first among equal timestamps so a simultaneous
        # A qualifies the B row (Δ = 0 is in-window)
        b_last = (g[type_col] == stage_b).to_numpy()
        order = np.lexsort((b_last, g[ts].to_numpy()))
        s = g.iloc[order]
        seg = np.zeros(len(s), dtype=np.int64)
        return _emit(s, seg, np.array([0], dtype=np.int64),
                     s[key].to_numpy()[:1])

    def block_fn(interior: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        seg0 = np.repeat(np.arange(len(starts), dtype=np.int64),
                         ends - starts)
        # one stable in-block sort: (segment, ts, A-before-B at ties)
        order = np.lexsort(((interior[type_col] == stage_b).to_numpy(),
                            interior[ts].to_numpy(), seg0))
        s = interior.iloc[order]
        seg = seg0  # lexsort keeps segments contiguous in seg0 order
        new_starts = np.concatenate(
            [[0], np.cumsum((ends - starts))[:-1]]).astype(np.int64)
        return _emit(s, seg, new_starts, s[key].to_numpy()[new_starts])

    return scan_sorted_groups(two, key, group_fn, out_empty,
                              min_group=1, block_fn=block_fn)


def funnel_latency(ds, key: str, ts: str, type_col: str,
                   stage_a: str, stage_b: str):
    """Per-key CONVERSION LATENCY: one row ``(key, latency_us)`` per
    key that has a ``stage_b`` event at-or-after its FIRST ``stage_a``
    event — ``latency_us = first qualifying stage_b ts − first
    stage_a ts`` in exact int64 microseconds (0 when simultaneous).
    The time-to-convert distribution that
    :func:`funnel_conversions`'s windowed conversion COUNT cannot
    give.

    Ray-native plan, no sorted scan: two filtered keys-sized MIN
    aggregates and two distributed hash joins
    (`ops/join.hash_join`) — the ``ts ≥ ta`` predicate runs
    vectorized inside ``map_batches`` after the stream⋈keys join, so
    the only shuffles are the aggregate exchanges and the
    keys-sized joins."""
    from .join import hash_join

    a = (ds.filter(expr=f"{type_col} == '{stage_a}'")
         .select_columns([key, ts])
         .groupby(key).min(ts))
    a = a.map_batches(
        lambda df: df.rename(columns={f"min({ts})": "__ta"}),
        batch_format="pandas")

    b_ev = (ds.filter(expr=f"{type_col} == '{stage_b}'")
            .select_columns([key, ts]))
    joined = hash_join(b_ev, a, on=key)

    def qualify(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        ta = df["__ta"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = pd.DataFrame({key: df[key], "__tb": t})
        return d[t >= ta]

    tb = (joined.map_batches(qualify, batch_format="pandas")
          .groupby(key).min("__tb"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ta = (df["__ta"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        return pd.DataFrame({
            key: df[key],
            "latency_us": (df["min(__tb)"].to_numpy(dtype=np.int64)
                           - ta),
        })

    return hash_join(tb, a, on=key).map_batches(
        finish, batch_format="pandas")
