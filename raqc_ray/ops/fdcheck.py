"""Functional-dependency violation census — for a declared FD
``lhs → rhs``, every ``lhs`` key bound to MORE than one distinct
``rhs`` value, with the evidence needed to triage it (distinct count,
row count, the lexical min/max exemplars).

This is the Deequ / Great-Expectations "hasUniqueValueRatio" /
"unique mapping" constraint class: master-data sanity (one customer →
one segment, one image_id → one fmt) that RangeCheck/ExprCheck cannot
express because it is a property of a GROUP, not a row.

Ray-Data-first plan: per-block ``(lhs, rhs) → count`` combiner (the
input stream never re-shuffles), ONE hash
``groupby(lhs, rhs).aggregate(Sum)`` for global pair counts, then a
second hash ``groupby(lhs)`` over one row per DISTINCT pair — counting
distinct rhs, summing rows and taking min/max exemplars with native
aggregates.  Both exchanges are distinct-pair-sized, not row-sized —
the same two-level discipline as :mod:`raqc_ray.ops.distinct`.

RAQC analog: none (SURVEY §2 validation-check surface extension;
sibling of UniquenessCheck, which is the special case rhs = row id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def fd_violations(ds, lhs: str, rhs: str):
    """Dataset ``(key, n_distinct, n_rows, rhs_min, rhs_max)`` — one
    row per ``lhs`` value that maps to more than one distinct ``rhs``
    (i.e. violates the functional dependency ``lhs → rhs``)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[lhs, rhs]].copy()
        d["__c"] = np.ones(len(d), dtype=np.int64)
        return d.groupby([lhs, rhs], sort=False, as_index=False).sum()

    pairs = (ds.map_batches(block_counts, batch_format="pandas")
             .groupby([lhs, rhs])
             .aggregate(Sum("__c", alias_name="__c")))
    out = (pairs.groupby(lhs).aggregate(
        Count(alias_name="n_distinct"),
        Sum("__c", alias_name="n_rows"),
        Min(rhs, alias_name="rhs_min"),
        Max(rhs, alias_name="rhs_max"),
    ).filter(expr="n_distinct > 1"))

    def rename(t):
        return t.rename_columns(
            ["key" if c == lhs else c for c in t.column_names])

    return out.map_batches(rename, batch_format="pyarrow")
