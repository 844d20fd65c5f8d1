"""Association-rule statistics (Apriori 2-itemset rules) — for every
ordered pair of items ``a → b`` co-occurring in enough baskets, the
classic support / confidence / lift triple, in EXACT scaled-integer
(ppm) arithmetic so the SQL oracle is bit-identical.

Baskets are keys (users, sessions), items are distinct values per key
(event types, tags).  With N = distinct baskets, n_a = baskets
containing ``a`` and n_ab = baskets containing both:

    support_ppm    = 10^6 · n_ab // N
    confidence_ppm = 10^6 · n_ab // n_a
    lift_ppm       = 10^6 · n_ab · N // (n_a · n_b)

All three floor-divide nonnegative integers — DuckDB ``//`` (truncate)
and Python ``//`` (floor) agree, and the lift numerator is computed in
Python ints / HUGEINT so it cannot overflow int64 at any N.

Ray-Data-first plan: the heavy input passes are the existing
distinct-pair machinery — per-block dedup combiners, ONE hash
``groupby(key, val)`` for basket-item incidence, the sorted-block pair
scan of :func:`raqc_ray.ops.cooc.grouped_cooccurrence` for n_ab, and a
vocabulary-sized ``groupby(val)`` for n_a.  The rule finish runs on
the item-vocabulary-sized tables (|items|² rows — driver-small by the
same contract as :mod:`raqc_ray.ops.contingency`).

RAQC analog: none; §2 LLM-pipeline surface (basket analysis /
tag-correlation audit before stratified sampling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def association_rules(ds, basket: str, item: str, min_pair_count: int = 1,
                      max_distinct: int = 5000):
    """pandas DataFrame ``(ante, cons, n_ab, n_a, n_b, support_ppm,
    confidence_ppm, lift_ppm)`` — one row per ORDERED item pair whose
    basket co-occurrence count reaches ``min_pair_count``."""
    from ray.data.aggregate import Count

    from .cooc import grouped_cooccurrence

    # ONE distinct-(basket,item) incidence pass feeds both margins.
    def block_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[[basket, item]].drop_duplicates()

    uniq = (ds.map_batches(block_dedup, batch_format="pandas")
            .groupby([basket, item])
            .aggregate(Count(alias_name="__c"))
            .drop_columns(["__c"])
            .materialize())  # shared by the margin pass and the pair scan

    item_counts = (uniq.groupby(item).aggregate(Count(alias_name="n_i"))
                   .to_pandas())  # vocabulary-sized
    n_baskets = int(
        uniq.groupby(basket).aggregate(Count(alias_name="__b")).count())

    pairs = grouped_cooccurrence(
        uniq, basket, item, min_count=min_pair_count,
        max_distinct=max_distinct).to_pandas()  # |items|² — driver-small

    n_of = dict(zip(item_counts[item], item_counts["n_i"].astype(int)))
    rows = []
    M = 10 ** 6
    for a, b, nab in zip(pairs["val_a"], pairs["val_b"],
                         pairs["n"].astype(int)):
        na, nb = n_of[a], n_of[b]
        lift = (M * nab * n_baskets) // (na * nb)
        rows.append((a, b, nab, na, nb, M * nab // n_baskets,
                     M * nab // na, lift))
        rows.append((b, a, nab, nb, na, M * nab // n_baskets,
                     M * nab // nb, lift))
    out = pd.DataFrame(
        rows, columns=["ante", "cons", "n_ab", "n_a", "n_b",
                       "support_ppm", "confidence_ppm", "lift_ppm"])
    for c in out.columns[2:]:
        out[c] = out[c].astype("int64")
    return out.sort_values(["ante", "cons"]).reset_index(drop=True)
