"""Cross-table reconciliation — the "does the parent's declared total
match the children's computed total?" constraint, the referential-
INTEGRITY sibling of referential EXISTENCE (checks/referential.py).

Validation semantics: for every parent key, compare a declared int64
total (parent column, pre-scaled by the caller to exact integer units)
against the SUM of an int64 per-child contribution column.  Both sides
are associative integer sums, so the deviation is exact and
layout-invariant — no float reduction order anywhere.  A parent with
NO child rows reconciles against 0 (a real mismatch, not a skipped
row), via a left-outer hash join.

Plan: block-combiner partial sums over the child stream (the shuffle
moves keys, not rows) → ONE keys-sized hash aggregation →
``left_outer`` hash join against the parent's (key, declared) pairs →
vectorized deviation + relative-tolerance flag → top-N by absolute
deviation (grouped top-k prune, nothing table-sized on the driver).

RAQC analog: SURVEY §2 F-family flag semantics (a computed statistic
vs a declared bound); the cross-TABLE form is part of the §2
constraint-validation surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def reconciliation_topn(parent, key: str, declared_col: str,
                        child, child_key: str, units_col: str,
                        scale: int, tol_num: int, tol_den: int,
                        n_top: int = 20):
    """Top-``n_top`` parents by absolute deviation between
    ``declared_col · scale`` and ``SUM(units_col)`` over their child
    rows, restricted to parents violating ``|dev| · tol_den >
    declared·scale · tol_num`` (i.e. relative deviation > tol_num/tol_den,
    evaluated in exact int64 arithmetic).

    ``parent``: Dataset with int64 ``key`` + int64 ``declared_col``;
    ``child``: Dataset with int64 ``child_key`` + int64 ``units_col``.
    Returns ``(key, declared_units, child_units, dev)`` sorted by
    (-dev, key) — deterministic.  Caveat: ``declared·scale`` and the
    child sums must fit int64."""
    from ray.data.aggregate import Sum

    from .join import hash_join

    def block_partials(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            child_key: df[child_key],
            "__u": df[units_col].to_numpy(dtype=np.int64),
        })
        return d.groupby(child_key, sort=False, as_index=False).sum()

    sums = (child.map_batches(block_partials, batch_format="pandas")
            .groupby(child_key)
            .aggregate(Sum("__u", alias_name="child_units")))
    if child_key != key:
        sums = sums.map_batches(
            lambda df: df.rename(columns={child_key: key}),
            batch_format="pandas")

    joined = hash_join(parent.select_columns([key, declared_col]), sums,
                       on=key, how="left_outer")

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        declared = df[declared_col].to_numpy(dtype=np.int64) * np.int64(scale)
        cu = df["child_units"].fillna(0).to_numpy(dtype=np.int64)
        dev = np.abs(declared - cu)
        bad = dev * np.int64(tol_den) > np.abs(declared) * np.int64(tol_num)
        return pd.DataFrame({
            key: df[key].to_numpy(dtype=np.int64)[bad],
            "declared_units": declared[bad],
            "child_units": cu[bad],
            "dev": dev[bad],
        })

    flagged = joined.map_batches(flag, batch_format="pandas")

    # per-block top-N prune, then one driver-side final top-N over the
    # (blocks × N)-sized survivors — same combiner shape as ops/topk.py
    def prune(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) <= n_top:
            return df
        return df.sort_values(["dev", key],
                              ascending=[False, True]).head(n_top)

    small = flagged.map_batches(prune, batch_format="pandas").to_pandas()
    out = small.sort_values(["dev", key],
                            ascending=[False, True]).head(n_top)
    return out.reset_index(drop=True)
