"""Cohort retention matrix — users bucketed by first-activity period,
counted per (cohort, periods-since-cohort) cell.

Ray-Data-first plan, three narrow exchanges and nothing row-scale on
the driver:

1. per-user first period: block partials (``user → min day``, a
   pandas groupby per block) → ONE hash ``groupby(user).min`` — the
   classic combiner-before-shuffle, so the exchange carries at most
   users × blocks rows, not events;
2. events ⋈ first-period on ``user`` via the distributed
   :func:`raqc_ray.ops.join.hash_join` (the user dimension grows with
   the corpus — broadcast would be wrong at 10¹²-row scale);
3. distinct (user, cohort, offset) then the cell count, both native
   hash groupbys over already-deduplicated carriers.

All period arithmetic is integer epoch-days (µs // 86 400 000 000) —
exact, tz-free, bit-identical to the SQL oracle.

RAQC analog: none; §2 training-data surface (contributor retention /
crawl-recency audits over an events log).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_US_PER_DAY = 86_400_000_000


def cohort_retention(ds, user: str, ts: str):
    """Dataset ``(cohort_day, day_offset, users)``: for each first-day
    cohort, how many of its users were active ``day_offset`` days
    later (offset 0 = the cohort day itself).  Days are integer epoch
    days."""
    from ray.data.aggregate import Count, Min

    from .join import hash_join

    def to_days(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            user: df[user].to_numpy(dtype=np.int64),
            "day": df[ts].to_numpy().astype("datetime64[us]")
            .astype(np.int64) // _US_PER_DAY,
        })

    days = ds.map_batches(to_days, batch_format="pandas")

    def block_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(user, sort=False, as_index=False).min()

    first = (days.map_batches(block_min, batch_format="pandas")
             .groupby(user)
             .aggregate(Min("day", alias_name="cohort_day")))

    j = hash_join(days, first, on=user)

    def cell(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            user: df[user].to_numpy(dtype=np.int64),
            "cohort_day": df["cohort_day"].to_numpy(dtype=np.int64),
            "day_offset": df["day"].to_numpy(dtype=np.int64)
            - df["cohort_day"].to_numpy(dtype=np.int64),
        }).drop_duplicates()

    carriers = (j.map_batches(cell, batch_format="pandas")
                .groupby([user, "cohort_day", "day_offset"])
                .aggregate(Count(alias_name="__one")))

    return (carriers.groupby(["cohort_day", "day_offset"])
            .aggregate(Count(alias_name="users"))
            .select_columns(["cohort_day", "day_offset", "users"]))


def activity_coverage(ds, user: str, ts: str, scale: int = 10 ** 6):
    """Per-entity activity-coverage audit: ``(user, days_active,
    span_days, cover)`` where ``cover = scale · distinct-active-days
    // span`` (span = last − first day + 1) — the regularity signal
    separating steady contributors from burst-and-vanish ones.

    Plan: block-dedup ``(user, day)`` partials → ONE hash groupby
    makes days exactly-once → per-user Min/Max/Count in a second
    combiner-fed groupby; integer epoch-days throughout, exact scaled
    division — bit-identical to the SQL oracle."""
    from ray.data.aggregate import Count, Max, Min

    def to_days(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            user: df[user].to_numpy(dtype=np.int64),
            "day": df[ts].to_numpy().astype("datetime64[us]")
            .astype(np.int64) // _US_PER_DAY,
        }).drop_duplicates()

    days = (ds.map_batches(to_days, batch_format="pandas")
            .groupby([user, "day"])
            .aggregate(Count(alias_name="__one")))

    agg = (days.groupby(user)
           .aggregate(Count(alias_name="days_active"),
                      Min("day", alias_name="__mn"),
                      Max("day", alias_name="__mx")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        mn = df["__mn"].to_numpy(dtype=np.int64)
        mx = df["__mx"].to_numpy(dtype=np.int64)
        act = df["days_active"].to_numpy(dtype=np.int64)
        span = mx - mn + 1
        return pd.DataFrame({
            user: df[user].to_numpy(dtype=np.int64),
            "days_active": act,
            "span_days": span,
            "cover": act * np.int64(scale) // span,
        })

    return agg.map_batches(finish, batch_format="pandas")
