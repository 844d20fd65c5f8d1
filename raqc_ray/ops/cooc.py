"""Grouped co-occurrence counts — for every unordered pair of distinct
values sharing a key, how many keys contain both.  The statistic behind
item-item co-occurrence matrices, tag correlation and session-basket
analysis in a training-data pipeline.

Ray-Data-first plan: block-level ``drop_duplicates`` combiner → ONE
hash ``groupby(key, value)`` for global distinct pairs (the input
stream never re-shuffles) → ONE sorted-block scan
(:func:`raqc_ray.ops.groupscan.scan_sorted_groups`) emitting each
key's ``C(d, 2)`` distinct-value pairs (vectorized ``triu_indices``
per segment inside one ``map_batches`` call per block — no Python task
per key) → a final hash groupby sums pair counts.

Skew guard: the pair fan-out is ``C(d, 2)`` per key, quadratic in the
per-key DISTINCT count.  A hot key (one user with 10⁵ distinct values
→ 5·10⁹ pairs) would OOM a worker, so keys whose distinct count
exceeds ``max_distinct`` raise a clear error instead of silently
exploding or silently truncating the counts; raise the cap (or
pre-filter/sample the hot keys upstream) deliberately.  Mirrors
``NearDupCheck.hot_bucket_cap``.

RAQC analog: none; §2 LLM-pipeline surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .groupscan import scan_sorted_groups


def grouped_cooccurrence(ds, key: str, val: str, min_count: int = 1,
                         max_distinct: int = 5000):
    """Dataset ``(val_a, val_b, n)`` with ``val_a < val_b``: the number
    of distinct keys whose value set contains both.  Raises if any
    key's distinct-value count exceeds ``max_distinct`` (documented
    C(d,2) blowup guard)."""
    from ray.data.aggregate import Count, Sum

    def block_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, val]].drop_duplicates()

    uniq = (ds.map_batches(block_dedup, batch_format="pandas")
            .groupby([key, val])
            .aggregate(Count(alias_name="__c"))
            .drop_columns(["__c"]))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = len(g)
        if d > max_distinct:
            raise ValueError(
                f"grouped_cooccurrence: key {g[key].iloc[0]!r} has {d} "
                f"distinct values (> max_distinct={max_distinct}); "
                "C(d,2) pair emission would explode — raise max_distinct "
                "or cap/sample hot keys upstream")
        vs = np.sort(g[val].to_numpy())
        i, j = np.triu_indices(d, 1)
        return pd.DataFrame({"val_a": vs[i], "val_b": vs[j],
                             "__n": np.ones(len(i), dtype=np.int64)})

    import pyarrow as pa

    from ._join_util import arrow_schema

    vt = arrow_schema(ds).field(val).type
    val_dtype = "int64" if pa.types.is_integer(vt) else "object"
    empty = pd.DataFrame({"val_a": pd.Series(dtype=val_dtype),
                          "val_b": pd.Series(dtype=val_dtype),
                          "__n": pd.Series(dtype="int64")})
    pair_partials = scan_sorted_groups(uniq, key, pairs, empty, min_group=2)
    out = (pair_partials.groupby(["val_a", "val_b"])
           .aggregate(Sum("__n", alias_name="n")))
    if min_count > 1:
        out = out.filter(expr=f"n >= {min_count}")
    return out
