"""Period-over-period RETENTION overlap — the WAU-retention census:
for every consecutive pair of activity periods, how many users were
active in the earlier one, the later one, and both.  The overlap
column is the numerator of week-over-week retention / churn and of
the period Jaccard — the first number any activity dashboard needs.

Pure integer plan, nothing user-list-sized ever leaves the workers:

1. distinct ``(period, user)`` rows via per-block dedup + ONE hash
   groupby (the `ops/distinct` discipline);
2. per-period totals: one aggregate (period-scale);
3. overlap: ONE distributed self hash-join on ``(user, period+1)``
   — each retained user contributes exactly one joined row — then a
   period-scale count;
4. consecutive-period stitching: period-scale joins only (totals x
   totals x overlap), left-outer so a fully-churned pair reports 0.

RAQC analog: none — SURVEY §2 training-data surface (the
set-overlap sibling of the cohort matrix q124 and the rolling
distinct q146).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["period_retention"]


def period_retention(ds, period_col: str, user_col: str):
    """Dataset ``(period, n_prev, n_cur, n_common)`` — one int64 row
    per period having a successor period with activity; ``n_common``
    counts users active in both ``period`` and ``period + 1``.
    ``period_col`` must already be an integer period index."""
    from ray.data.aggregate import Count

    from .join import hash_join

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[[period_col, user_col]].drop_duplicates()

    wu = (ds.map_batches(dedup, batch_format="pandas")
          .groupby([period_col, user_col])
          .aggregate(Count(alias_name="__c"))
          .drop_columns(["__c"])).materialize()

    tot = wu.groupby(period_col).aggregate(Count(alias_name="n"))

    def shift(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "__wk1": df[period_col].to_numpy(dtype=np.int64) - 1,
            "__u1": df[user_col].to_numpy(dtype=np.int64),
        })

    later = wu.map_batches(shift, batch_format="pandas")
    joined = hash_join(wu, later, on=(user_col, period_col),
                       right_on=("__u1", "__wk1")).materialize()
    # a fully-churned corpus yields an EMPTY join whose groupby block
    # is schema-less and poisons the native left-outer join below —
    # route the zero-overlap case through a constant column instead
    any_common = joined.count() > 0
    if any_common:
        com = joined.groupby(period_col).aggregate(
            Count(alias_name="n_common"))

    def _rn(wkc, nc):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns={period_col: wkc, "n": nc})

        return fn

    cur = tot.map_batches(_rn("__wk2", "n_cur"),
                          batch_format="pandas")

    def back(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        d["__wk2"] = d["__wk2"].astype(np.int64) - 1
        return d

    cur = cur.map_batches(back, batch_format="pandas")
    pairs = hash_join(tot, cur, on=period_col, right_on="__wk2")
    if any_common:
        out = hash_join(pairs, com.map_batches(
            lambda df: df.rename(columns={period_col: "__wkc"}),
            batch_format="pandas"), on=period_col, right_on="__wkc",
            how="left_outer")
    else:
        def zero(df: pd.DataFrame) -> pd.DataFrame:
            d = df.copy()
            d["n_common"] = np.zeros(len(d), dtype=np.int64)
            return d

        out = pairs.map_batches(zero, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "period": df[period_col].to_numpy(dtype=np.int64),
            "n_prev": df["n"].to_numpy(dtype=np.int64),
            "n_cur": df["n_cur"].to_numpy(dtype=np.int64),
            "n_common": df["n_common"].fillna(0)
                         .to_numpy(dtype=np.int64),
        })

    return out.map_batches(finish, batch_format="pandas")
