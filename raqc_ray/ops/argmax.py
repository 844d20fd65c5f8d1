"""Grouped ARG_MAX / "row with the max" — carry whole payload rows to
the per-key maximum of an ordering column, without sorting the table.

Ray-Data-first plan (the grouped-top-k combiner specialized to k=1,
but payload-carrying): each block keeps ONE row per key present in it
(stable sort inside the block + ``tail(1)`` per key — vectorized
pandas), so the hash ``groupby`` that follows moves at most
keys × blocks rows; a ``map_groups`` over those (already tiny) groups
picks the global winner with the same rule.  ``tiebreak`` makes the
pick total — SQL ``ROW_NUMBER() OVER (... ORDER BY order DESC,
tiebreak DESC) = 1`` semantics, bit-reproducible across layouts.

RAQC analog: none (SURVEY §2.5 stops at min/max scalars); part of the
§2 training-data-pipeline surface (best-scoring caption per image,
latest revision per document).
"""

from __future__ import annotations

import pandas as pd


def grouped_arg_max(ds, key: str, order_by: str,
                    tiebreak: str | None = None):
    """Dataset with one full input row per key: the row holding the
    key's maximum ``(order_by, tiebreak)``.  All input columns are
    preserved."""
    sort_cols = [order_by] + ([tiebreak] if tiebreak else [])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(sort_cols, kind="mergesort")
        return s.groupby(key, sort=False, as_index=False).tail(1)

    partial = ds.map_batches(pick, batch_format="pandas")
    return partial.groupby(key).map_groups(pick, batch_format="pandas")


def grouped_mode(ds, key: str, value_col: str):
    """Per-key MODE: the most frequent ``value_col`` per key, smallest
    value winning ties — SQL ``ROW_NUMBER() OVER (PARTITION BY key
    ORDER BY COUNT(*) DESC, value ASC) = 1`` semantics.

    Plan: per-block partial counts (vectorized pandas groupby) → one
    hash ``groupby(key, value)`` Sum moving at most
    distinct-pairs × blocks rows → the k=1 payload-carrying combiner
    from :func:`grouped_arg_max`, specialized so ties break to the
    SMALLEST value (sort (n asc, value desc), keep the last row per
    key).  Output columns: ``key``, ``value_col``, ``n``.
    """
    from ray.data.aggregate import Sum

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        d = (df.groupby([key, value_col], sort=False)
             .size().reset_index(name="n"))
        return d

    cnt = (ds.map_batches(counts, batch_format="pandas")
           .groupby([key, value_col])
           .aggregate(Sum("n", alias_name="n")))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["n", value_col], ascending=[True, False],
                           kind="mergesort")
        return s.groupby(key, sort=False, as_index=False).tail(1)

    partial = cnt.map_batches(pick, batch_format="pandas")
    return partial.groupby(key).map_groups(pick, batch_format="pandas")
