"""Schema-aware table diff — row-level comparison of two epochs of
the same table (the record-level complement of the validation
pipeline's histogram drift check: drift says *that* a column moved,
this says *which rows and cells*).

Output is one row per difference: ``(key, col, old_val, new_val,
change_type)`` with ``change_type`` in ``added`` / ``removed`` (key
present on one side only; ``col``/values null) and ``changed`` (key on
both sides, one row per compared column whose value differs).

Ray-Data-first plan: ONE distributed full-outer hash join on the key
(:func:`raqc_ray.ops.join.hash_join` — hash-partition both sides, no
materialization) and one vectorized ``map_batches`` over the joined
blocks that emits the difference rows.  Nothing input-sized ever
collects; the output is difference-sized, which for epoch validation
is violation-sized.  Compared columns must be numeric (they are
compared as float64; NaN on both sides counts as equal).

Determinism: exact float64 equality per cell — layout-invariant, so
the result hashes bit-identically to the SQL FULL OUTER JOIN oracle.
Caveat: the outer join nulls the absent side's key, so the int64 key
round-trips through float64 on one-sided rows — exact up to 2^53
(beyond that, hash-bucket the key space or use a string key).

RAQC analog: SURVEY §2.9 F1 drift flags are per-band aggregates; the
reference has no row-level diff.  Part of the §2 validation surface
(epoch regression triage, ingestion reconciliation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def table_diff(ds_a, ds_b, key: str, compare_cols: list[str],
               num_partitions: int | None = None,
               out_cols=("col", "old_val", "new_val", "change_type")):
    """Dataset ``(key, col, old_val, new_val, change_type)`` — the
    cell-level differences from ``ds_a`` (old) to ``ds_b`` (new)."""
    from .join import hash_join

    col_c, old_c, new_c, type_c = out_cols

    def tag_a(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key] + compare_cols].copy()
        d["__in_a"] = np.int8(1)
        return d

    def tag_b(df: pd.DataFrame) -> pd.DataFrame:
        # carry the key twice: Ray's outer join keeps the LEFT key
        # column, which is null for right-only (added) rows
        d = pd.DataFrame({key: df[key], "__b_key": df[key]})
        for c in compare_cols:
            d["__b_" + c] = df[c]
        d["__in_b"] = np.int8(1)
        return d

    a = ds_a.map_batches(tag_a, batch_format="pandas")
    b = ds_b.map_batches(tag_b, batch_format="pandas")
    j = hash_join(a, b, on=key, how="full_outer",
                  num_partitions=num_partitions)

    key_dtype = "int64"

    def empty_out() -> pd.DataFrame:
        return pd.DataFrame({
            key: pd.Series(dtype=key_dtype),
            col_c: pd.Series(dtype="object"),
            old_c: pd.Series(dtype="float64"),
            new_c: pd.Series(dtype="float64"),
            type_c: pd.Series(dtype="object"),
        })

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty_out()
        in_a = df["__in_a"].notna().to_numpy()
        in_b = df["__in_b"].notna().to_numpy()
        # coalesce the key across sides (left key is null on added rows)
        ka = df[key].to_numpy(dtype=np.float64, na_value=np.nan)
        kb = df["__b_key"].to_numpy(dtype=np.float64, na_value=np.nan)
        k = np.where(in_a, ka, kb).astype(np.int64)
        frames: list[pd.DataFrame] = []
        for mask, ct in ((in_a & ~in_b, "removed"), (~in_a & in_b, "added")):
            if mask.any():
                frames.append(pd.DataFrame({
                    key: k[mask], col_c: None,
                    old_c: np.nan, new_c: np.nan, type_c: ct,
                }))
        both = in_a & in_b
        for c in compare_cols:
            av = df[c].to_numpy(dtype=np.float64, na_value=np.nan)
            bv = df["__b_" + c].to_numpy(dtype=np.float64, na_value=np.nan)
            m = both & (av != bv) & ~(np.isnan(av) & np.isnan(bv))
            if m.any():
                frames.append(pd.DataFrame({
                    key: k[m], col_c: c,
                    old_c: av[m], new_c: bv[m], type_c: "changed",
                }))
        if not frames:
            return empty_out()
        out = pd.concat(frames, ignore_index=True)
        return out[[key, col_c, old_c, new_c, type_c]]

    return j.map_batches(emit, batch_format="pandas")
