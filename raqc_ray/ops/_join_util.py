"""Shared plumbing for the sort-based custom joins (as-of, interval).

Both joins run the same Ray-Data-first plan: harmonize the two sides
into ONE tagged stream (left payload columns null on right rows and
vice versa, typed nulls via pyarrow), ONE ``sort`` by the equality key
(the only all-to-all), then a per-group vectorized scan. This module
owns step 1 plus the schema-restoring output cast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def drop_empty_blocks(ds):
    """Rebuild ``ds`` without EMPTY blocks, reusing the existing block
    refs zero-copy.

    Ray Data's sort emits schema-less empty blocks for empty key
    ranges, and map_batches passes empty blocks through WITHOUT
    invoking the UDF (so they also never pick up downstream renames) —
    the native hash-shuffle ``Dataset.join`` then fails with "No match
    ... for key field" on them.  This helper materializes (a no-op cost
    for join inputs, which the hash shuffle consumes fully anyway),
    normalizes non-empty blocks to Arrow with one zero-copy identity
    map, and reconstructs from the surviving refs.  If every block is
    empty the dataset is returned as-is (nothing useful to join)."""
    import ray.data as rd

    mat = ds.map_batches(lambda t: t, batch_format="pyarrow").materialize()
    keep, total = [], 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            total += 1
            if meta.num_rows:
                keep.append(ref)
    if not keep or len(keep) == total:
        return mat
    return rd.from_arrow_refs(keep)


def arrow_schema(ds) -> pa.Schema:
    """Dataset schema as pyarrow — pandas-backed datasets report a
    PandasBlockSchema (names + numpy dtypes); map it over (object
    dtype → string, the only ambiguous case)."""
    s = ds.schema()
    base = getattr(s, "base_schema", s)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(base.names, base.types):
        try:
            fields.append(pa.field(n, pa.from_numpy_dtype(t)))
        except (pa.ArrowNotImplementedError, TypeError):
            fields.append(pa.field(n, pa.string()))
    return pa.schema(fields)


def tagged_union(left_ds, right_ds, on: str, right_on: str):
    """Pad both sides to one schema + ``__side__`` tag (1=left, 0=right)
    and union them. Returns
    ``(union_ds, out_schema, out_cols, left_cols, right_payload)``
    where ``out_schema`` is the join output schema (every left column
    then every right column except the right key)."""
    lschema = arrow_schema(left_ds)
    rschema = arrow_schema(right_ds)
    left_cols = list(lschema.names)
    right_payload = [c for c in rschema.names if c != right_on]
    clash = set(left_cols) & set(right_payload)
    if clash:
        raise ValueError(f"column name clash between sides: {sorted(clash)}")
    out_fields = [lschema.field(c) for c in left_cols] + [
        rschema.field(c) for c in right_payload
    ]
    out_schema = pa.schema(out_fields)

    def pad_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: b[c] for c in left_cols}
        for c in right_payload:
            cols[c] = pa.nulls(n, type=rschema.field(c).type)
        cols["__side__"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    def pad_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {}
        for c in left_cols:
            cols[c] = (b[right_on] if c == on
                       else pa.nulls(n, type=lschema.field(c).type))
        for c in right_payload:
            cols[c] = b[c]
        cols["__side__"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    union = left_ds.map_batches(pad_left, batch_format="pyarrow").union(
        right_ds.map_batches(pad_right, batch_format="pyarrow")
    )
    return union, out_schema, list(out_schema.names), left_cols, right_payload


