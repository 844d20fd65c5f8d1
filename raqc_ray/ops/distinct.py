"""Exact grouped COUNT(DISTINCT x) — the two-level aggregation
pattern, with a per-block dedup combiner so the shuffle moves unique
pairs, not rows.

Plan: (1) ``map_batches`` drops duplicate ``(key, x)`` pairs inside
each block — on real streams (events per user, docs per domain) this
shrinks the exchange by the per-block repeat factor before anything
moves; (2) ``groupby([key, x]).aggregate(Count)`` hash-shuffles the
surviving pairs to global uniqueness; (3) the second
``groupby(key).aggregate(Count)`` runs over one row per unique pair —
input-sized nothing, all-to-all only on pair keys. This is the exact
complement of the HLL sketch path (`raqc_ray/sketches/hll.py`): use
HLL inside the validation pipeline where ±2% suffices at 10^12 rows,
and this operator where exactness is the contract (dedup accounting,
per-split leakage audits).

RAQC analog: none (SURVEY §2.5 A7 covers the approximate path); part
of the §2 "large-scale training-data pipeline" surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def grouped_count_distinct(ds, key: str, distinct_col: str,
                           out_col: str = "n_distinct"):
    """Dataset with columns ``(key, out_col)`` — exact distinct count
    of ``distinct_col`` per ``key``."""
    from ray.data.aggregate import Count

    def block_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, distinct_col]].drop_duplicates()

    pairs = ds.map_batches(block_dedup, batch_format="pandas")
    uniq = pairs.groupby([key, distinct_col]).aggregate(
        Count(alias_name="__c__")
    )
    out = uniq.groupby(key).aggregate(Count(alias_name=out_col))
    return out.select_columns([key, out_col])


def grouped_collect_set(ds, key: str, val: str, sep: str = ",",
                        out_col: str = "vals"):
    """Per-key sorted distinct-value concatenation — SQL
    ``string_agg(DISTINCT val, sep ORDER BY val)`` — plus
    ``n_distinct``.  Plan: per-block drop_duplicates combiner (the
    value stream shrinks to block-distinct pairs), ONE hash
    ``groupby(key, val)`` for global distinct, then a per-key
    map_groups join (groups are distinct-values-sized, never
    row-sized).  Sorting before the join makes the string deterministic
    across block layouts."""
    from ray.data.aggregate import Count

    def block_sets(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, val]].drop_duplicates()

    dedup = (ds.map_batches(block_sets, batch_format="pandas")
             .groupby([key, val])
             .aggregate(Count(alias_name="__c"))
             .drop_columns(["__c"]))

    def join_fn(g: pd.DataFrame) -> pd.DataFrame:
        vals = sorted(map(str, g[val].tolist()))
        return pd.DataFrame({key: [g[key].iloc[0]],
                             out_col: [sep.join(vals)],
                             "n_distinct": [np.int64(len(vals))]})

    return dedup.groupby(key).map_groups(join_fn, batch_format="pandas")
