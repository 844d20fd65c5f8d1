"""Grouped co-occurrence counts — for every unordered pair of distinct
values sharing a key, how many keys contain both.  The statistic behind
item-item co-occurrence matrices, tag correlation and session-basket
analysis in a training-data pipeline.

Ray-Data-first plan: block-level ``drop_duplicates`` combiner → ONE
hash ``groupby(key, value)`` for global distinct pairs (the input
stream never re-shuffles) → per-key ``map_groups`` emits the
``C(d, 2)`` pairs of each key's DISTINCT value set (vectorized
``triu_indices``) → a final hash groupby sums pair counts.

Partitioning assumption: per-key distinct-value sets are
vocabulary-bounded (event types, tags, categories) — the pair fan-out
is ``C(d,2)`` per key, quadratic in the per-key DISTINCT count, not in
row count.  For unbounded per-key sets, cap or sample upstream.

RAQC analog: none; §2 LLM-pipeline surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def grouped_cooccurrence(ds, key: str, val: str, min_count: int = 1):
    """Dataset ``(val_a, val_b, n)`` with ``val_a < val_b``: the number
    of distinct keys whose value set contains both."""
    from ray.data.aggregate import Count, Sum

    def block_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, val]].drop_duplicates()

    uniq = (ds.map_batches(block_dedup, batch_format="pandas")
            .groupby([key, val])
            .aggregate(Count(alias_name="__c"))
            .drop_columns(["__c"]))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        vs = np.sort(g[val].to_numpy())
        i, j = np.triu_indices(len(vs), 1)
        return pd.DataFrame({"val_a": vs[i], "val_b": vs[j],
                             "__n": np.ones(len(i), dtype=np.int64)})

    pair_partials = uniq.groupby(key).map_groups(pairs,
                                                 batch_format="pandas")
    out = (pair_partials.groupby(["val_a", "val_b"])
           .aggregate(Sum("__n", alias_name="n")))
    if min_count > 1:
        out = out.filter(expr=f"n >= {min_count}")
    return out
