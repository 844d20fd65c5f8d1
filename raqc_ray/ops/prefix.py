"""Global ordered prefix sum — ``SUM(v) OVER (ORDER BY o ROWS
UNBOUNDED PRECEDING)`` without a partition key — and the token-budget
sharder built on it (contiguous ≈B-token training shards).

A keyless running sum is the canonical "looks sequential" operator; the
distributed plan is the classic two-phase carried-offset scan:

1. bucket every row by a MONOTONE function of the order column (so
   bucket ranges tile the global order) — one cheap ``map_batches``;
2. per-bucket totals via one small ``groupby().aggregate(Sum)``
   (bucket-count-sized, not data-sized), exclusive-cumsummed on the
   driver into a broadcast offset table;
3. within each bucket, an exclusive cumsum over order-sorted rows via
   ``scan_sorted_groups``'s vectorized block path, plus the bucket's
   carried offset.

Nothing data-sized ever lands on the driver; the only exchange is the
sort's range partition.  Values must be integers — the per-bucket and
global sums are then associative int64 arithmetic, bit-identical to the
SQL window oracle under any block layout (the same integer-cents
discipline as the rolling/winsorize ops).

Partitioning assumptions (documented per SURVEY.md "custom operators"):
``order_col`` values are UNIQUE ints (a total order — SQL's ROWS frame
is nondeterministic under ties too) and one bucket fits in a worker.

RAQC analog: none (SURVEY §2); part of the §2 training-data surface
(token-budget sharding for sequence packing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._join_util import arrow_schema
from .groupscan import scan_sorted_groups

_BKT = "__pfx_bucket"


def ordered_prefix_sum(ds, order_col: str, value_col: str,
                       out_col: str = "prefix_excl",
                       n_buckets: int = 64):
    """Appends ``out_col`` (int64): the EXCLUSIVE prefix sum of
    ``value_col`` in ascending ``order_col`` order — i.e. ``SUM(v)
    OVER (ORDER BY o ROWS UNBOUNDED PRECEDING) - v``."""
    from ray.data.aggregate import Max, Min, Sum

    # pin the input: the range aggregate, the bucket totals and the
    # sort are three executions of this lineage — without pinning, an
    # expensive or non-reproducible upstream runs three times (the
    # grouped_share/kmeans_fit discipline)
    ds = ds.materialize()
    stats = ds.aggregate(Min(order_col, alias_name="lo"),
                         Max(order_col, alias_name="hi"))
    if stats.get("lo") is None or ds.schema() is None:
        # empty input (a repartitioned empty Dataset can even lose its
        # schema) — declare the two required columns plus out_col
        import ray.data as rd

        s = ds.schema()
        if s is not None:
            out_empty = arrow_schema(ds).empty_table().to_pandas()
        else:
            out_empty = pd.DataFrame({order_col: pd.Series(dtype="int64"),
                                      value_col: pd.Series(dtype="int64")})
        out_empty[out_col] = pd.Series(dtype="int64")
        return rd.from_pandas(out_empty)
    base_empty = arrow_schema(ds).empty_table().to_pandas()
    out_empty = base_empty.copy()
    out_empty[out_col] = pd.Series(dtype="int64")
    lo, hi = float(stats["lo"]), float(stats["hi"])
    width = max(hi - lo, 0.0) + 1.0

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        v = df[order_col].to_numpy(dtype=np.float64)
        # float64 conversion and round-to-nearest arithmetic are both
        # monotone non-decreasing, so bucket ids tile the order even
        # when the ints exceed 2^53 — ties can only merge, never swap
        b = np.floor((v - lo) * n_buckets / width).astype(np.int64)
        out = df.copy()
        out[_BKT] = np.clip(b, 0, n_buckets - 1)
        return out

    bds = ds.map_batches(bucketize, batch_format="pandas")

    # per-bucket totals via BLOCK PARTIALS: each block emits at most
    # n_buckets (bucket, int64 partial) rows, so the exchange is
    # bucket-count × blocks — never the data stream (a plain
    # groupby().aggregate(Sum) would shuffle every row to compute 64
    # numbers)
    def block_totals(df: pd.DataFrame) -> pd.DataFrame:
        b = df[_BKT].to_numpy(dtype=np.int64)
        v = df[value_col].to_numpy(dtype=np.int64)
        s = np.zeros(n_buckets, dtype=np.int64)   # exact int64 adds
        np.add.at(s, b, v)
        present = np.bincount(b, minlength=n_buckets) > 0
        return pd.DataFrame({_BKT: np.flatnonzero(present),
                             "__t": s[present]})

    totals = (bds.map_batches(block_totals, batch_format="pandas")
              .groupby(_BKT)
              .aggregate(Sum("__t", alias_name="__t"))
              .to_pandas())
    tmap = {int(b): int(t) for b, t in zip(totals[_BKT], totals["__t"])}
    # exclusive offsets for EVERY bucket id in arbitrary-precision
    # Python ints (Ray's Sum merged the int64 block partials exactly;
    # absent buckets contribute 0)
    offs: dict[int, int] = {}
    acc = 0
    for b in range(n_buckets):
        offs[b] = acc
        acc += tmap.get(b, 0)

    in_cols = list(base_empty.columns)
    scan_empty = base_empty.copy()
    scan_empty[_BKT] = pd.Series(dtype="int64")
    scan_out = scan_empty.copy()
    scan_out[out_col] = pd.Series(dtype="int64")
    out_cols = list(scan_out.columns)

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        v = s[value_col].to_numpy(dtype=np.int64)
        s[out_col] = (np.cumsum(v) - v) + offs[int(s[_BKT].iloc[0])]
        return s[out_cols]

    def block_fn(interior: pd.DataFrame, starts, ends) -> pd.DataFrame:
        # bucket is monotone in order_col, so a stable sort by order
        # alone keeps segments contiguous at the SAME offsets
        s = (interior.sort_values(order_col, kind="mergesort")
             .reset_index(drop=True))
        v = s[value_col].to_numpy(dtype=np.int64)
        excl = np.cumsum(v) - v
        seg_id = np.zeros(len(s), dtype=np.int64)
        seg_id[starts[1:]] = 1
        seg_id = np.cumsum(seg_id)
        base = excl[starts]
        bkt = s[_BKT].to_numpy(dtype=np.int64)
        off = np.array([offs[int(b)] for b in bkt[starts]], dtype=np.int64)
        s[out_col] = excl - base[seg_id] + off[seg_id]
        return s[out_cols]

    res = scan_sorted_groups(bds, _BKT, group_fn, scan_out, min_group=1,
                             block_fn=block_fn)
    return res.drop_columns([_BKT])


def token_shards(docs_ds, id_col: str, text_col: str, budget: int):
    """Contiguous token-budget sharding: ``(id_col, n_tokens,
    shard_id)`` with ``shard_id = floor(exclusive_prefix_tokens /
    budget)`` in ``id_col`` order — deterministic ≈``budget``-token
    training shards (documents never reorder; a document may straddle
    two shards exactly as the SQL window definition does).  Token
    counts are whitespace tokens with empties dropped, matching
    ``len(list_filter(string_split(text,' '), w -> w <> ''))``."""
    import pyarrow.compute as pc

    def count_tokens(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n = np.bincount(parent[nonempty], minlength=len(t)).astype(np.int64)
        return pa.table({
            id_col: t[id_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "n_tokens": n,
        })

    counted = docs_ds.map_batches(count_tokens, batch_format="pyarrow")
    pref = ordered_prefix_sum(counted, id_col, "n_tokens",
                              out_col="__pfx")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, "n_tokens"]].copy()
        # token counts are non-negative so // (floor) == SQL trunc
        out["shard_id"] = (df["__pfx"].to_numpy(dtype=np.int64)
                           // budget)
        return out

    return pref.map_batches(finish, batch_format="pandas")


def global_ntile(ds, order_col: str, n_tiles: int, out_col: str = "tile",
                 n_buckets: int = 64):
    """Global equi-depth binning — SQL ``NTILE(n) OVER (ORDER BY
    order_col)`` with no partition key (quantile bucketing for
    curriculum ordering / difficulty binning / equi-depth histograms).

    Plan: the 0-based global row number is :func:`ordered_prefix_sum`
    of a ones column (the same two-phase carried-offset scan — nothing
    data-sized on the driver), then one vectorized ``map_batches``
    applies the exact NTILE split (the first ``n % n_tiles`` buckets
    take one extra row).  All-integer arithmetic — bit-identical to the
    SQL window oracle under any block layout.  Same assumptions as
    :func:`ordered_prefix_sum`: ``order_col`` is UNIQUE ints (encode a
    composite (value, tiebreak) order as one int if needed)."""
    ds = ds.materialize()
    n = ds.count()

    def ones(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__one"] = np.ones(len(df), dtype=np.int64)
        return out

    pref = ordered_prefix_sum(ds.map_batches(ones, batch_format="pandas"),
                              order_col, "__one", out_col="__rn",
                              n_buckets=n_buckets)
    base, rem = divmod(n, n_tiles) if n_tiles > 0 else (0, 0)
    boundary = rem * (base + 1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        i = df["__rn"].to_numpy(dtype=np.int64)
        if base > 0:
            tile = np.where(i < boundary, i // (base + 1) + 1,
                            rem + (i - boundary) // base + 1)
        else:
            # fewer rows than tiles: row i alone occupies tile i+1
            tile = i + 1
        out = df.drop(columns=["__one", "__rn"])
        out[out_col] = tile.astype(np.int64)
        return out

    return pref.map_batches(finish, batch_format="pandas")
