"""Distributed set operations — INTERSECT / EXCEPT (distinct
semantics) on a key column across two Datasets.

Composition of existing machinery, shuffle-minimal:

1. the LEFT side is made globally distinct (block-dedup combiner →
   one hash aggregation — the output of a set op is a set, so this
   shuffle is unavoidable and pair-key-sized);
2. the RIGHT side is only block-deduped and projected to its key —
   semi/anti membership does not need global distinctness, so the
   right side never pays a shuffle of its own beyond the join's;
3. Ray-native ``left_semi`` (INTERSECT) / ``left_anti`` (EXCEPT)
   hash join does the membership test.

UNION DISTINCT is ``left.union(right)`` through the same distinct
step; plain UNION ALL is Ray's ``union`` and needs no operator here.

RAQC analog: none (SURVEY §2.6 — the reference has no set
operations); part of the §2 "large-scale training-data pipeline"
surface (id-universe reconciliation between tables/epochs).
"""

from __future__ import annotations

import pandas as pd


def _distinct_keys(ds, col: str):
    """Globally distinct values of one column (block-dedup combiner →
    hash aggregation; the Count payload is dropped)."""
    from ray.data.aggregate import Count

    dedup = ds.select_columns([col]).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )
    return dedup.groupby(col).aggregate(
        Count(alias_name="__c__")
    ).select_columns([col])


def _block_keys(ds, col: str):
    return ds.select_columns([col]).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )


def _anchor(ds, key_ds, col: str):
    """Union one zero-row block of the key's declared type: an
    all-filtered set op must still report its output schema (an empty
    anti/semi join otherwise yields a column-less to_pandas)."""
    import pyarrow as pa
    import ray.data as rd

    from ._join_util import arrow_schema

    schema = pa.schema([arrow_schema(key_ds).field(col)])
    return ds.union(rd.from_arrow(schema.empty_table()))


def intersect_distinct(left_ds, right_ds, on: str,
                       right_on: str | None = None):
    """Distinct ``on`` values present in BOTH sides (SQL INTERSECT).
    Output column is named after the left key."""
    from .join import semi_join

    right_on = right_on or on
    keys = _distinct_keys(left_ds, on)
    return _anchor(semi_join(keys, _block_keys(right_ds, right_on),
                             on=on, right_on=right_on), left_ds, on)


def except_distinct(left_ds, right_ds, on: str,
                    right_on: str | None = None):
    """Distinct ``on`` values present on the left but NOT the right
    (SQL EXCEPT)."""
    from .join import anti_join

    right_on = right_on or on
    keys = _distinct_keys(left_ds, on)
    return _anchor(anti_join(keys, _block_keys(right_ds, right_on),
                             on=on, right_on=right_on), left_ds, on)


def union_distinct(left_ds, right_ds, on: str,
                   right_on: str | None = None):
    """Distinct ``on`` values present on EITHER side (SQL UNION)."""
    right_on = right_on or on
    r = right_ds.select_columns([right_on])
    if right_on != on:
        # rename through an Arrow batch map: Dataset.rename_columns
        # projects per-block and breaks on pandas-backed blocks
        r = r.map_batches(lambda t: t.rename_columns([on]),
                          batch_format="pyarrow")
    return _distinct_keys(left_ds.select_columns([on]).union(r), on)

def membership_mask_counts(ds, entity_col: str, category_col: str,
                           bit_map: dict):
    """Audience-overlap profile: how many entities belong to each
    COMBINATION of categories — one row ``(mask, n_entities)`` per
    observed bitmask, where ``mask = Σ bit_map[category]`` over the
    entity's distinct categories (the Venn-cell census that a plain
    per-category count cannot express).

    Plan: block-dedup ``(entity, category)`` partials → hash groupby
    makes membership global and exactly-once → bit values summed per
    entity (Σ of distinct power-of-two bits ≡ OR) → combiner-fed
    count per mask.  Every exchange carries entity- or mask-scale
    rows, never input rows.  Unmapped categories raise (a silent drop
    would corrupt the census)."""
    import numpy as np
    from ray.data.aggregate import Min, Sum

    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[entity_col, category_col]].drop_duplicates()
        missing = set(d[category_col]) - set(bit_map)
        if missing:
            raise ValueError(
                f"membership_mask_counts: unmapped categories {missing}")
        d = d.assign(__bit=d[category_col].map(bit_map)
                     .astype(np.int64))
        return d[[entity_col, category_col, "__bit"]]

    pairs = (ds.map_batches(block_pairs, batch_format="pandas")
             .groupby([entity_col, category_col])
             .aggregate(Min("__bit", alias_name="__bit")))

    masks = (pairs.groupby(entity_col)
             .aggregate(Sum("__bit", alias_name="mask")))

    def mask_partials(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"mask": df["mask"].to_numpy(dtype=np.int64),
                          "n_entities": np.ones(len(df),
                                                dtype=np.int64)})
        return d.groupby("mask", sort=False, as_index=False).sum()

    return (masks.map_batches(mask_partials, batch_format="pandas")
            .groupby("mask")
            .aggregate(Sum("n_entities", alias_name="n_entities")))
