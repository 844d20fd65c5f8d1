"""ROLLUP / hierarchical grouping-sets aggregation — every prefix level
of a key hierarchy from ONE pass over the input.

Ray-Data-first plan: the input is aggregated ONCE at the finest level
(per-block combiner partials → one hash ``groupby``), then each coarser
level re-aggregates the FINEST-LEVEL RESULT — which is keys-sized, not
input-sized — driver-free, as a chain of small Dataset groupbys.  At
10^12 rows the input is read and shuffled exactly once; the rollup
levels cost (distinct finest keys) each.  Subtotal rows carry the
``all_label`` sentinel in the rolled-up key columns (the SQL oracle
mirrors with ``COALESCE``), keeping the output schema
sentinel-uniform instead of null-polymorphic.

Determinism: every stage sums int64 row values ``floor(v*scale + 0.5)``
(exact, order-independent); the single float division happens in the
finish step, so output is bit-identical across block layouts and CPU
counts and matches a ``SUM(FLOOR(v*scale + 0.5))/scale`` SQL oracle.
(Caveat shared with the other cents-discipline ops: the scaled sum must
fit int64 — at ~10^18 cents pick a smaller ``scale``.)

RAQC analog: none (SURVEY §2.6 covers flat groupbys only); part of the
§2 training-data-pipeline surface (per-source / per-source-and-shard
corpus accounting in one pass).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def rollup_agg(ds, keys: list[str], value_col: str,
               all_label: str = "ALL", round_to: int = 4,
               scale: int = 100):
    """Dataset with columns ``(*keys, n, sum_value)`` — one row per
    group at every rollup level ``(k1..km), (k1..km-1), ..., ()``;
    rolled-up key columns hold ``all_label`` (keys are cast to string
    for sentinel uniformity)."""
    from ray.data.aggregate import Sum

    def block_partials(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({k: df[k].astype(str) for k in keys})
        d["n"] = np.ones(len(df), dtype=np.int64)
        # integer-cents discipline: float sums depend on reduction order
        # (block layout) — scale each row to int64 once, sum exactly,
        # divide only in finish (same recipe as q77/q78)
        d["sum_value"] = np.floor(
            df[value_col].to_numpy(dtype=np.float64) * scale + 0.5
        ).astype(np.int64)
        return d.groupby(keys, sort=False, as_index=False).sum()

    finest = (ds.map_batches(block_partials, batch_format="pandas")
              .groupby(keys)
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sum_value", alias_name="sum_value")))

    levels = [finest]
    cur = finest
    for i in range(len(keys) - 1, -1, -1):
        rolled = keys[i:]
        kept = keys[:i]

        def relabel(df: pd.DataFrame, _rolled=tuple(rolled)) -> pd.DataFrame:
            d = df.copy()
            for k in _rolled:
                d[k] = all_label
            return d

        if kept:
            cur = (cur.map_batches(relabel, batch_format="pandas")
                   .groupby(kept)
                   .aggregate(Sum("n", alias_name="n"),
                              Sum("sum_value", alias_name="sum_value")))
        else:
            cur = (cur.map_batches(relabel, batch_format="pandas")
                   .groupby(keys[0])  # all rows share the sentinel key
                   .aggregate(Sum("n", alias_name="n"),
                              Sum("sum_value", alias_name="sum_value")))
        cur = cur.map_batches(
            lambda df, _r=tuple(rolled): _ensure_cols(df, keys, all_label),
            batch_format="pandas")
        levels.append(cur)

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        d["n"] = d["n"].astype("int64")
        d["sum_value"] = (d["sum_value"].astype("float64")
                          / scale).round(round_to)
        return d[keys + ["n", "sum_value"]]

    return out.map_batches(finish, batch_format="pandas")


def _ensure_cols(df: pd.DataFrame, keys: list[str],
                 all_label: str) -> pd.DataFrame:
    d = df.copy()
    for k in keys:
        if k not in d.columns:
            d[k] = all_label
    return d[keys + ["n", "sum_value"]]


def cube_agg(ds, keys: list[str], value_col: str,
             all_label: str = "ALL", round_to: int = 4,
             scale: int = 100):
    """GROUP BY CUBE: one row per group at EVERY key subset (2^m
    grouping sets); rolled-up key columns hold ``all_label``.  Columns
    ``(*keys, n, sum_value)``.

    Same derive-from-the-finest-level plan as :func:`rollup_agg` —
    the input stream is aggregated ONCE (per-block combiner + one hash
    groupby); the other 2^m − 1 grouping sets are tiny groupbys over
    the distinct-combos-sized finest table, so adding grouping sets
    costs nothing at input scale."""
    from ray.data.aggregate import Sum

    def block_partials(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({k: df[k].astype(str) for k in keys})
        d["n"] = np.ones(len(df), dtype=np.int64)
        # integer-cents discipline: float sums depend on reduction order
        # (block layout) — scale each row to int64 once, sum exactly,
        # divide only in finish (same recipe as q77/q78)
        d["sum_value"] = np.floor(
            df[value_col].to_numpy(dtype=np.float64) * scale + 0.5
        ).astype(np.int64)
        return d.groupby(keys, sort=False, as_index=False).sum()

    finest = (ds.map_batches(block_partials, batch_format="pandas")
              .groupby(keys)
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sum_value", alias_name="sum_value")))

    levels = []
    for mask in range(1 << len(keys)):
        kept = [k for i, k in enumerate(keys) if (mask >> i) & 1]
        rolled = [k for k in keys if k not in kept]
        if not rolled:
            levels.append(finest)
            continue

        def relabel(df: pd.DataFrame, _r=tuple(rolled)) -> pd.DataFrame:
            d = df.copy()
            for k in _r:
                d[k] = all_label
            return d

        lv = finest.map_batches(relabel, batch_format="pandas")
        lv = (lv.groupby(kept if kept else [keys[0]])
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sum_value", alias_name="sum_value")))
        lv = lv.map_batches(
            lambda df: _ensure_cols(df, keys, all_label),
            batch_format="pandas")
        levels.append(lv)

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        d["n"] = d["n"].astype("int64")
        d["sum_value"] = (d["sum_value"].astype("float64")
                          / scale).round(round_to)
        return d[keys + ["n", "sum_value"]]

    return out.map_batches(finish, batch_format="pandas")
