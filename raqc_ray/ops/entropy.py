"""Grouped Shannon entropy of a categorical column — the
distribution-health stat a training-data pipeline tracks per source /
per user / per shard (a collapsed entropy flags template spam or a
broken upstream filter).

Plan: the same distributed value-histogram as
:mod:`raqc_ray.ops.quantile_exact` — per-block ``(key, value) → count``
combiner, ONE hash groupby Sum, then a per-key ``map_groups`` over the
histogram rows (distinct-values-sized, never row-sized) computes
``−Σ (c/n)·ln(c/n)``.  Counts are exact int64 (associative), so the
probabilities are bit-identical across block layouts; the output is
rounded (``round_to``) to absorb libm ln() last-ulp differences between
engines.

RAQC analog: none (SURVEY §2.5 stops at cardinality); §2 LLM-pipeline
surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def grouped_entropy(ds, key: str, value_col: str, round_to: int = 6):
    """Dataset ``(key, n, n_distinct, entropy)`` — natural-log Shannon
    entropy of the ``value_col`` distribution per key."""
    from ray.data.aggregate import Sum

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, value_col]].copy()
        d["__c"] = np.ones(len(d), dtype=np.int64)
        return d.groupby([key, value_col], sort=False, as_index=False).sum()

    hist = (ds.map_batches(block_counts, batch_format="pandas")
            .groupby([key, value_col])
            .aggregate(Sum("__c", alias_name="__c")))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        c = g["__c"].to_numpy(dtype=np.float64)
        n = c.sum()
        p = c / n
        ent = float(-(p * np.log(p)).sum())
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n": [np.int64(n)],
                             "n_distinct": [np.int64(len(c))],
                             "entropy": [round(ent, round_to)]})

    return hist.groupby(key).map_groups(finish, batch_format="pandas")
