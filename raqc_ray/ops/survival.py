"""Kaplan–Meier risk table — the survival-analysis census over entity
lifetimes (user activity spans, document retention), in exact int64
arithmetic.

Each key's lifetime is ``t = floor((max ts − min ts) in seconds)``;
the key counts as an EVENT if it accumulated at least ``min_events``
rows (it demonstrably churned after a full history) and as CENSORED
otherwise (observation ended first).  The risk table has one row per
distinct lifetime ``t_s`` with

    n_event    — events at exactly t_s
    n_censored — censored at exactly t_s
    n_risk     — keys still at risk at t_s  (lifetime ≥ t_s)

which is the sufficient statistic of the KM estimator: Ŝ(t) =
Π_{t_i ≤ t} (1 − n_event_i / n_risk_i).  The float product is left to
the caller — every column here is an exact integer, so the SQL oracle
(grouped min/max/count + one descending window suffix-sum) is
bit-identical.

Ray-Data-first plan: ONE hash ``groupby(key)`` with native
Min/Max/Count aggregates (the only row-sized exchange), then a
lifetime-histogram ``groupby(t_s)`` over one row per key, and the
suffix cumsum on the driver over the distinct-lifetime histogram —
value-histogram finish, same contract as
:mod:`raqc_ray.ops.quantile_exact` (distinct lifetimes ≪ rows).

RAQC analog: none; §2 LLM-pipeline surface (cohort retention /
lifecycle audit before time-split sampling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def km_risk_table(ds, key: str, ts_col: str, min_events: int = 5):
    """pandas DataFrame ``(t_s, n_event, n_censored, n_risk)`` sorted
    by lifetime — the exact Kaplan–Meier risk table of per-``key``
    activity spans in whole seconds."""
    from ray.data.aggregate import Count, Max, Min, Sum

    spans = ds.groupby(key).aggregate(
        Min(ts_col, alias_name="__t0"),
        Max(ts_col, alias_name="__t1"),
        Count(alias_name="__n"),
    )

    def lifetime(df: pd.DataFrame) -> pd.DataFrame:
        t0 = df["__t0"].astype("datetime64[us]").astype("int64")
        t1 = df["__t1"].astype("datetime64[us]").astype("int64")
        ev = (df["__n"].to_numpy() >= min_events).astype(np.int64)
        return pd.DataFrame({
            "t_s": (t1 - t0) // 1_000_000,  # nonneg: floor == trunc
            "__ev": ev,
            "__cen": 1 - ev,
        })

    hist = (spans.map_batches(lifetime, batch_format="pandas")
            .groupby("t_s")
            .aggregate(Sum("__ev", alias_name="n_event"),
                       Sum("__cen", alias_name="n_censored"))
            .to_pandas())  # distinct lifetimes — histogram-small
    hist = hist.sort_values("t_s", ascending=False).reset_index(drop=True)
    at = (hist["n_event"] + hist["n_censored"]).to_numpy(dtype=np.int64)
    hist["n_risk"] = np.cumsum(at)
    out = hist.sort_values("t_s").reset_index(drop=True)
    for c in ("t_s", "n_event", "n_censored", "n_risk"):
        out[c] = out[c].astype("int64")
    return out[["t_s", "n_event", "n_censored", "n_risk"]]
