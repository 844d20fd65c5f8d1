"""Sorted-neighborhood candidate-pair generation — the classic
record-linkage / dedup blocking method (Hernández & Stolfo, SIGMOD
1995): order records by a blocking key and emit every pair within a
sliding window of ``w`` ranks.

Ray-Data-first plan: ONE global ``sort`` by ``(order_cols…, id)``
(the only all-to-all; the id tiebreak makes the order total, so the
output is layout-invariant), then

1. within-block pairs: one vectorized ``map_batches`` over whole
   sorted blocks (``batch_size=None``) — each block emits its rank
   pairs ``(i, j), j−i ≤ w`` with two ``np.repeat``/``concat`` calls;
2. cross-block pairs: every block also emits its first/last ``w``
   rows with ``(block_tag, within_pos, block_len)``; a row NOT in a
   block's first/last ``w`` is ≥ w+1 ranks from every other block, so
   this edge set provably contains all cross-block pairs.  The edge
   set is ``blocks × 2w`` rows — bounded and tiny by construction —
   and is resolved on the driver with exact global ranks
   (block-offset prefix sums), covering pairs that span thin blocks.

Output: ``(a_id, b_id)`` with ``a`` the earlier rank.  Downstream, an
expensive verifier (edit distance, Jaccard) runs on candidates only —
the same candidate-then-verify shape as ``checks/neardup`` and
``ops/editdist``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sorted_neighborhood_pairs(ds, order_cols, id_col: str, window: int):
    """Candidate pairs of ids within ``window`` ranks of the total
    order ``(order_cols…, id_col)``."""
    import ray.data as rd

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    order = list(order_cols) + [id_col]
    sorted_ds = ds.sort(order).materialize()

    def within(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(dtype=np.int64)
        n = len(ids)
        a_parts, b_parts = [], []
        for d in range(1, min(window, n - 1) + 1):
            a_parts.append(ids[:n - d])
            b_parts.append(ids[d:])
        if not a_parts:
            return pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                                 "b_id": pd.Series(dtype="int64")})
        return pd.DataFrame({"a_id": np.concatenate(a_parts),
                             "b_id": np.concatenate(b_parts)})

    pairs_within = sorted_ds.map_batches(within, batch_format="pandas",
                                         batch_size=None)

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        take = np.unique(np.concatenate([
            np.arange(min(window, n)),
            np.arange(max(0, n - window), n)]))
        out = df.iloc[take][order].copy()
        out["__pos"] = take.astype(np.int64)
        out["__blen"] = np.int64(n)
        # block tag: the block's first id — unique, and blocks are
        # disjoint sorted ranges so tag order == block order
        out["__tag"] = np.int64(df[id_col].iloc[0])
        return out

    e = (sorted_ds.map_batches(edges, batch_format="pandas",
                               batch_size=None)
         .to_pandas())
    if len(e):
        # exact global rank of every edge row: blocks ordered by tag
        # (disjoint ranges ⇒ first-row order == block order), offsets
        # from the per-block length carried on each row
        blocks = (e.groupby("__tag")["__blen"].first()
                  .sort_index())
        tag_sorted = (e[["__tag"]].drop_duplicates()
                      .merge(e.groupby("__tag").head(1)[order + ["__tag"]],
                             on="__tag")
                      .sort_values(order)["__tag"].to_numpy())
        offsets = {}
        acc = 0
        for t in tag_sorted:
            offsets[t] = acc
            acc += int(blocks[t])
        e = e.assign(__rank=e["__tag"].map(offsets).to_numpy()
                     + e["__pos"].to_numpy())
        e = e.sort_values("__rank", kind="mergesort").reset_index(drop=True)
        ranks = e["__rank"].to_numpy(dtype=np.int64)
        ids = e[id_col].to_numpy(dtype=np.int64)
        tags = e["__tag"].to_numpy(dtype=np.int64)
        # edge set is blocks × 2w rows; the quadratic mask over it is
        # bounded work, and only CROSS-block pairs are emitted here
        i, j = np.meshgrid(np.arange(len(e)), np.arange(len(e)),
                           indexing="ij")
        m = ((ranks[j] - ranks[i] >= 1)
             & (ranks[j] - ranks[i] <= window)
             & (tags[i] != tags[j]))
        cross = pd.DataFrame({"a_id": ids[i[m]], "b_id": ids[j[m]]})
    else:
        cross = pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                              "b_id": pd.Series(dtype="int64")})

    return pairs_within.union(rd.from_pandas(cross))
