"""General distributed hash join (VERDICT r1 what's-missing #1).

Every other join in the engine is a broadcast (ok-set fits in one
object) or a khash candidate reduction (referential).  This operator
covers the remaining case — two large sides joined on arbitrary keys —
by delegating to Ray Data's native hash-shuffle ``Dataset.join``
(hash-partition both sides on the key, join per partition; one
all-to-all each side, no full materialization anywhere).

Partitioning note for 100-TB use: ``num_partitions`` defaults to the
engine-wide ``shuffle_width()`` (CPU-derived); skewed keys should be
pre-salted by the caller (same contract as groupby).  RAQC analog: none
(the reference joins rasters by grid alignment only).
"""

from __future__ import annotations


def hash_join(left_ds, right_ds, on, right_on=None, how: str = "inner",
              num_partitions: int | None = None,
              left_suffix: str | None = None,
              right_suffix: str | None = None):
    """Distributed hash join of two Datasets.

    ``on`` may be a string or tuple of key columns.  ``how`` is one of
    inner / left_outer / right_outer / full_outer.  Colliding non-key
    column names must be disambiguated via ``left_suffix`` /
    ``right_suffix`` (passed through to the native join).
    """
    from ._join_util import drop_empty_blocks

    if num_partitions is None:
        from raqc_ray.pipelines.validate import shuffle_width

        num_partitions = shuffle_width()
    if isinstance(on, str):
        on = (on,)
    if isinstance(right_on, str):
        right_on = (right_on,)
    # empty blocks (sort ranges / all-filtered maps) lack the key field
    # and crash the native hash join — strip them zero-copy first
    left_ds = drop_empty_blocks(left_ds)
    right_ds = drop_empty_blocks(right_ds)
    return left_ds.join(
        right_ds,
        join_type=how,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on else None,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )


def broadcast_join(left_ds, small_df, on, right_on=None,
                   how: str = "inner"):
    """Map-side join against a SMALL side: the pandas frame
    ``small_df`` is put in the object store ONCE (``ray.put``) and every
    map task merges its block against the shared zero-copy reference —
    no shuffle of either side, the big side streams through untouched.
    This is the scale path whenever one side fits a worker's heap
    (dimension tables, code lookups): at 10^12 left rows the cost is
    one object-store read per task versus :func:`hash_join`'s two
    all-to-all exchanges.  ``how`` is "inner" or "left"."""
    import pandas as pd
    import ray

    if right_on is None:
        right_on = on
    ref = ray.put(small_df)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(ref)
        out = df.merge(small, how=how, left_on=on, right_on=right_on)
        if right_on != on and right_on in out.columns:
            out = out.drop(columns=[right_on])
        return out

    return left_ds.map_batches(merge, batch_format="pandas")


def broadcast_join_arrow(left_ds, small_table, on):
    """Map-side inner join against a SMALL side held as an ARROW
    table: unlike :func:`broadcast_join` (pandas ``merge``, which
    re-deserializes and re-hashes the small side per task — measured
    as the wall of the rank-mapping stage at 2M+ small-side rows),
    the Arrow table is read ZERO-COPY from the object store and the
    per-batch join runs in Acero (``pyarrow.Table.join``) — a C++
    hash build over memory the task never copies.

    Contract: inner join, ``on`` columns present both sides, no
    non-key name collisions (the rank-mapping shape).  Output column
    order is left-columns-then-new-right-columns, matching
    ``broadcast_join``."""
    import pyarrow as pa
    import ray

    if isinstance(on, str):
        on = [on]
    on = list(on)
    if isinstance(small_table, pa.Table):
        tbl = small_table
    else:  # pandas fallback
        tbl = pa.Table.from_pandas(small_table, preserve_index=False)
    ref = ray.put(tbl)

    def merge(batch: pa.Table) -> pa.Table:
        small = ray.get(ref)
        # Acero needs identical key types; cast the small side once
        # per task (cheap, key columns only)
        casts = {}
        for k in on:
            lt = batch.schema.field(k).type
            if small.schema.field(k).type != lt:
                casts[k] = lt
        if casts:
            small = pa.table({
                c: (small[c].cast(casts[c]) if c in casts else small[c])
                for c in small.column_names})
        return batch.join(small, keys=on, join_type="inner")

    return left_ds.map_batches(merge, batch_format="pyarrow")


def semi_join(left_ds, right_ds, on, right_on=None,
              num_partitions: int | None = None):
    """Distributed semi join: left rows with >= 1 key match on the
    right (``EXISTS`` semantics — left columns only, no duplication
    however many right rows match). Same hash-shuffle plan as
    :func:`hash_join`; the right side should be pre-filtered and
    projected to its key columns so only keys shuffle."""
    return hash_join(left_ds, right_ds, on, right_on, how="left_semi",
                     num_partitions=num_partitions)


def anti_join(left_ds, right_ds, on, right_on=None,
              num_partitions: int | None = None):
    """Distributed anti join: left rows with NO key match on the right
    (``NOT EXISTS`` semantics). See :func:`semi_join`."""
    return hash_join(left_ds, right_ds, on, right_on, how="left_anti",
                     num_partitions=num_partitions)


def cross_join(left_ds, small_df):
    """Cartesian product against a SMALL side — SQL ``CROSS JOIN``.

    Same broadcast discipline as :func:`broadcast_join`: the pandas
    frame ``small_df`` is put in the object store ONCE and every map
    task takes the cartesian product of its block with the shared
    zero-copy reference — the big side streams through with no shuffle.
    Output size is |left| × |small|, so the small side must be
    dim-sized (the caller's contract; a fact×fact cartesian is a design
    error at any scale, not an operator gap).
    """
    import pandas as pd
    import ray

    ref = ray.put(small_df)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(ref), how="cross")

    return left_ds.map_batches(merge, batch_format="pandas")
