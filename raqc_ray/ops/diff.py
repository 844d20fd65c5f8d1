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

Both the tag stages and the emit stage produce EXPLICITLY-TYPED arrow
tables: Ray's pandas→arrow conversion maps an all-null pandas column
to the arrow ``null`` type, which acero's hash join rejects, and empty
pandas blocks lose their dtypes — arrow-first blocks keep the schema
stable even for empty/degenerate inputs.

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
import pyarrow as pa
import pyarrow.compute as pc


def table_diff(ds_a, ds_b, key: str, compare_cols: list[str],
               num_partitions: int | None = None,
               out_cols=("col", "old_val", "new_val", "change_type")):
    """Dataset ``(key, col, old_val, new_val, change_type)`` — the
    cell-level differences from ``ds_a`` (old) to ``ds_b`` (new)."""
    from .join import hash_join

    col_c, old_c, new_c, type_c = out_cols
    out_schema = pa.schema([
        (key, pa.int64()), (col_c, pa.string()),
        (old_c, pa.float64()), (new_c, pa.float64()),
        (type_c, pa.string()),
    ])

    def tag_a(t: pa.Table) -> pa.Table:
        cols = {key: pc.cast(t[key], pa.int64())}
        for c in compare_cols:
            cols[c] = pc.cast(t[c], pa.float64())
        cols["__in_a"] = pa.array(np.ones(len(t), dtype=np.int8))
        return pa.table(cols)

    def tag_b(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key], pa.int64())
        # carry the key twice: the outer join keeps the LEFT key
        # column, which is null for right-only (added) rows
        cols = {key: k, "__b_key": k}
        for c in compare_cols:
            cols["__b_" + c] = pc.cast(t[c], pa.float64())
        cols["__in_b"] = pa.array(np.ones(len(t), dtype=np.int8))
        return pa.table(cols)

    a = ds_a.map_batches(tag_a, batch_format="pyarrow")
    b = ds_b.map_batches(tag_b, batch_format="pyarrow")
    j = hash_join(a, b, on=key, how="full_outer",
                  num_partitions=num_partitions)

    def _f64(t: pa.Table, c: str) -> np.ndarray:
        return (t[c].combine_chunks()
                .to_numpy(zero_copy_only=False).astype(np.float64))

    def emit(t: pa.Table) -> pa.Table:
        n = len(t)
        if not n:
            return out_schema.empty_table()
        in_a = ~np.isnan(_f64(t, "__in_a"))
        in_b = ~np.isnan(_f64(t, "__in_b"))
        # coalesce the key across sides (left key is null on added rows)
        ka = _f64(t, key)
        kb = _f64(t, "__b_key")
        k = np.where(in_a, ka, kb).astype(np.int64)
        ks, cols, olds, news, types = [], [], [], [], []
        for mask, ct in ((in_a & ~in_b, "removed"), (~in_a & in_b, "added")):
            m = int(mask.sum())
            if m:
                ks.append(k[mask])
                cols.append(np.full(m, None, dtype=object))
                olds.append(np.full(m, np.nan))
                news.append(np.full(m, np.nan))
                types.append(np.full(m, ct, dtype=object))
        both = in_a & in_b
        for c in compare_cols:
            av = _f64(t, c)
            bv = _f64(t, "__b_" + c)
            m = both & (av != bv) & ~(np.isnan(av) & np.isnan(bv))
            cnt = int(m.sum())
            if cnt:
                ks.append(k[m])
                cols.append(np.full(cnt, c, dtype=object))
                olds.append(av[m])
                news.append(bv[m])
                types.append(np.full(cnt, "changed", dtype=object))
        if not ks:
            return out_schema.empty_table()
        return pa.table({
            key: pa.array(np.concatenate(ks), type=pa.int64()),
            col_c: pa.array(np.concatenate(cols), type=pa.string()),
            old_c: pa.array(np.concatenate(olds), type=pa.float64()),
            new_c: pa.array(np.concatenate(news), type=pa.float64()),
            type_c: pa.array(np.concatenate(types), type=pa.string()),
        }, schema=out_schema)

    return j.map_batches(emit, batch_format="pyarrow")
