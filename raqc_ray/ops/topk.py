"""Grouped top-k (windowed rank) — ``ROW_NUMBER() OVER (PARTITION BY k
ORDER BY v) <= k`` as a distributed operator.

Ray-Data-first plan (SURVEY.md "custom operators" route (a)):

1. **partial prune combiner** — one ``map_batches`` pass keeps only each
   key's top-k rows *within the block* (vectorized
   ``sort_values`` + ``groupby(...).head(k)``). This is the scale lever:
   the shuffle input shrinks from all rows to ≤ k rows per key per
   block, so the sort moves O(k · keys) rows, not the table;
2. ONE ``sort`` by key (the only all-to-all);
3. :func:`scan_sorted_groups` merges per-key partials and assigns the
   final rank 1..k (``min_group=1`` — a singleton is a valid group).

Determinism: ``tiebreak`` must be a unique column (ties in the order
column are broken by ascending tiebreak), so output is bit-for-bit
stable across block layouts — the planted tests shuffle partitions and
assert identical frames.

Partitioning assumption: k · (distinct keys in one sorted block) rows
fit in a worker block — guaranteed, since the scan input is already
pruned to ≤ k rows per key per *input* block.

RAQC analog: none (SURVEY §2.6 lists only global sort/limit); this is
part of the §2 "operations a large-scale training-data pipeline needs"
surface (e.g. best-k captions per image, top-k docs per domain).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .groupscan import scan_sorted_groups


def grouped_topk(ds, key: str, order_by: str, k: int,
                 ascending: bool = False, tiebreak: str | None = None,
                 rank_col: str = "rank"):
    """Returns one top-k Dataset; every input column is preserved and
    ``rank_col`` (int64, 1-based) is appended."""
    from .asof import _arrow_schema

    sort_cols = [order_by] + ([tiebreak] if tiebreak else [])
    sort_asc = [ascending] + ([True] if tiebreak else [])

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return (df.sort_values(sort_cols, ascending=sort_asc,
                               kind="mergesort")
                .groupby(key, sort=False).head(k))

    pruned = ds.map_batches(prune, batch_format="pandas")

    out_empty = _arrow_schema(ds).empty_table().to_pandas()
    out_empty[rank_col] = pd.Series(dtype="int64")

    out_cols = list(out_empty.columns)

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        top = (g.sort_values(sort_cols, ascending=sort_asc,
                             kind="mergesort").head(k)
               .reset_index(drop=True))
        top[rank_col] = np.arange(1, len(top) + 1, dtype=np.int64)
        return top[out_cols]

    return scan_sorted_groups(pruned, key, group_fn, out_empty,
                              min_group=1)
