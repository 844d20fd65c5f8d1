"""Event-sequence transition matrix — global counts of adjacent
``state -> next state`` steps within each key's ordered stream (the
first-order-Markov summary a behavioral / session-modeling pipeline
derives from an event log, and the bigram-over-categories analog of
:mod:`raqc_ray.ops.corpus`'s collocation miner).

Ray-Data-first plan (SURVEY.md "custom operators" route (a), the
window-family skeleton): ONE ``sort`` by key — the only all-to-all —
then :func:`raqc_ray.ops.groupscan.scan_sorted_groups` with a
vectorized ``block_fn``: one stable re-sort of the whole block by
``(key, order_by, tiebreak)`` re-orders EVERY segment at once (the
leading key keeps segments contiguous, so the precomputed segment
bounds stay valid), one shifted comparison marks within-segment
adjacency, and one pandas groupby collapses the block's transitions to
``(from_state, to_state, partial n)`` rows.  The final
``groupby.aggregate(Sum)`` moves at most ``states² × blocks`` rows —
never the event stream.  Counts are exact int64, so the result is
layout-invariant and hashes bit-identically to the SQL
``LEAD() OVER (PARTITION BY key ORDER BY ...)`` oracle.

Determinism: ``tiebreak`` must make ``(order_by, tiebreak)`` a total
order within each key, or adjacent pairs are nondeterministic.

Partitioning assumption (documented per SURVEY.md): one key's full
stream fits a worker block — the same contract as
:mod:`raqc_ray.ops.window` / :mod:`raqc_ray.ops.sessions`; boundary
(block-straddling) keys are handled exactly once by the scan's
boundary pass, distributed when oversized.

RAQC analog: none (SURVEY §2.6 — the reference has no sequence
operators); part of the §2 "large-scale training-data pipeline"
surface (session modeling, curriculum ordering, next-event features).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .groupscan import scan_sorted_groups


def transition_counts(ds, key, order_by: str, state_col: str,
                      tiebreak: str | None = None,
                      from_col: str = "from_state",
                      to_col: str = "to_state",
                      out_col: str = "n"):
    """Dataset ``(from_col, to_col, out_col)`` — global exact counts of
    adjacent state transitions within each ``key``'s ``(order_by,
    tiebreak)``-ordered stream.  SQL equivalent::

        SELECT from_state, to_state, COUNT(*) FROM (
          SELECT state AS from_state,
                 LEAD(state) OVER (PARTITION BY key
                                   ORDER BY order_by, tiebreak) AS to_state
          FROM t) WHERE to_state IS NOT NULL GROUP BY 1, 2
    """
    from ray.data.aggregate import Sum

    keys = [key] if isinstance(key, str) else list(key)
    sort_cols = [order_by] + ([tiebreak] if tiebreak else [])

    out_empty = pd.DataFrame({
        from_col: pd.Series(dtype="object"),
        to_col: pd.Series(dtype="object"),
        out_col: pd.Series(dtype="int64"),
    })

    def pair_counts(frm: np.ndarray, to: np.ndarray) -> pd.DataFrame:
        if len(frm) == 0:
            return out_empty
        d = pd.DataFrame({from_col: frm, to_col: to})
        g = (d.groupby([from_col, to_col], sort=False)
             .size().reset_index(name=out_col))
        g[out_col] = g[out_col].astype("int64")
        return g

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(sort_cols, kind="mergesort")
        st = s[state_col].to_numpy()
        if len(st) < 2:
            return out_empty
        return pair_counts(st[:-1], st[1:])

    def block_fn(interior: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        # One stable sort re-orders every segment at once; because the
        # key columns lead, each segment keeps its exact position, so
        # `starts`/`ends` remain valid on the re-sorted frame.
        s = interior.sort_values(keys + sort_cols,
                                 kind="mergesort").reset_index(drop=True)
        n = len(s)
        if n < 2:
            return out_empty
        # inside qualifying segments (min_group-filtered bounds)
        mark = np.zeros(n + 1, dtype=np.int64)
        np.add.at(mark, starts, 1)
        np.add.at(mark, ends, -1)
        inside = np.cumsum(mark[:n]) > 0
        # row i -> i+1 is a transition iff both rows share every key
        # (adjacent segments touch, so `inside` alone is not enough)
        same = np.ones(n - 1, dtype=bool)
        for k in keys:
            a = s[k].to_numpy()
            same &= a[1:] == a[:-1]
        valid = inside[:-1] & inside[1:] & same
        st = s[state_col].to_numpy()
        return pair_counts(st[:-1][valid], st[1:][valid])

    partials = scan_sorted_groups(ds, key, group_fn, out_empty,
                                  min_group=2, block_fn=block_fn)
    out = partials.groupby([from_col, to_col]).aggregate(
        Sum(out_col, alias_name=out_col))
    return out.select_columns([from_col, to_col, out_col])


def journey_prefix(ds, key, order_by: str, state_col: str,
                   k: int = 5, sep: str = ">",
                   tiebreak: str | None = None,
                   out_col: str = "journey"):
    """Per-key ordered path prefix — ``(key, out_col, n_events)``
    where ``out_col`` joins the FIRST ``k`` states of each key's
    ``(order_by, tiebreak)``-ordered stream with ``sep`` and
    ``n_events`` is the key's full stream length (SQL
    ``string_agg(state, sep ORDER BY rn) ... WHERE rn <= k``).  The
    session-path feature a behavioral pipeline derives per user;
    deterministic because ``tiebreak`` totalizes the order.

    Same one-sort + sorted-group-scan plan as
    :func:`transition_counts`; the per-block pass ranks every segment
    with one vectorized carried-offset subtraction and joins only
    ``≤ k × groups`` strings.
    """
    from ._join_util import arrow_schema

    keys = [key] if isinstance(key, str) else list(key)
    sort_cols = [order_by] + ([tiebreak] if tiebreak else [])

    # key columns keep their INPUT dtypes (an object-typed empty frame
    # would declare a string schema for an int64 key)
    out_empty = arrow_schema(ds).empty_table().to_pandas()[keys]
    out_empty[out_col] = pd.Series(dtype="object")
    out_empty["n_events"] = pd.Series(dtype="int64")
    out_cols = list(out_empty.columns)

    def _join_prefix(d: pd.DataFrame) -> pd.DataFrame:
        # d: key-sorted rows already ranked and truncated to rn < k,
        # with __n carrying each key's full count
        g = (d.groupby(keys, sort=False)
             .agg(**{out_col: (state_col, sep.join),
                     "n_events": ("__n", "first")})
             .reset_index())
        g["n_events"] = g["n_events"].astype("int64")
        return g[out_cols]

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(sort_cols, kind="mergesort")
        d = s.head(k).copy()
        d["__n"] = np.int64(len(g))
        return _join_prefix(d)

    def block_fn(interior: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        s = interior.sort_values(keys + sort_cols,
                                 kind="mergesort").reset_index(drop=True)
        n = len(s)
        seg_id = np.zeros(n, dtype=np.int64)
        seg_id[starts[1:]] = 1
        seg_id = np.cumsum(seg_id)
        rn = np.arange(n, dtype=np.int64) - starts[seg_id]
        d = s[rn < k].copy()
        d["__n"] = (ends - starts)[seg_id[rn < k]]
        return _join_prefix(d)

    return scan_sorted_groups(ds, key, group_fn, out_empty, min_group=1,
                              block_fn=block_fn)
