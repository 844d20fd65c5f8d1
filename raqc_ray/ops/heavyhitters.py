"""Approximate heavy hitters (frequent items) via mergeable Misra-Gries
summaries — top-k over an UNBOUNDED vocabulary without shuffling it.

:func:`token_counts` is exact but its exchange is vocabulary-sized; on
a 100-TB corpus with long-tail n-grams the vocabulary itself is the
problem.  Misra-Gries (1982) summaries are mergeable (Agarwal et al.,
"Mergeable Summaries", PODS 2012 — public knowledge): each block
reduces to ≤ m counters plus a scalar error bound; counters add up
under a tiny hash groupby; every item with true count > Σ block errors
is guaranteed present, and each reported count carries exact
lower/upper bounds ``[count_lo, count_hi]``.

Plan: per-block exact ``value_counts`` (cheap, block-local) → truncate
to an m-counter MG summary (subtract the (m+1)-th largest count, keep
positives — the classic reduction) → ONE hash groupby Sum over
≤ (m+1) × blocks rows (each block adds one bookkeeping row carrying
its error mass) → finish attaches the global error bound.  Nothing
vocabulary-sized ever moves.

Determinism note: bounds depend on the block layout (like any
mergeable sketch), so the operator is property-gated (all true heavy
hitters found; true count always inside [lo, hi]) rather than
hash-compared against a SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def approx_heavy_hitters(ds, col: str, m: int = 64,
                         min_count: int | None = None):
    """Dataset ``(value, count_lo, count_hi)`` of candidate frequent
    items of ``col``.  Guarantees: every item with true count
    > (Σ per-block truncation errors) is present, and
    ``count_lo ≤ true count ≤ count_hi`` for every reported item.
    ``min_count`` filters on the GUARANTEED count (count_lo)."""
    from ray.data.aggregate import Sum

    def block_summary(b: pa.Table) -> pd.DataFrame:
        vc = pc.value_counts(b[col])
        vals = vc.field("values").to_pandas().astype(str)
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(
            np.int64)
        if len(cnts) > m:
            order = np.argsort(-cnts, kind="mergesort")
            cut = int(cnts[order[m]])     # (m+1)-th largest
            keep = order[:m]
            kept = cnts[keep] - cut
            pos = kept > 0
            out = pd.DataFrame({"value": vals.iloc[keep[pos]].to_numpy(),
                                "count_lo": kept[pos]})
            err = cut
        else:
            out = pd.DataFrame({"value": vals.to_numpy(),
                                "count_lo": cnts})
            err = 0
        out["__is_err"] = np.zeros(len(out), dtype=np.int64)
        err_row = pd.DataFrame({"value": [""], "count_lo": [np.int64(err)],
                                "__is_err": [np.int64(1)]})
        return pd.concat([out, err_row], ignore_index=True)

    partial = ds.map_batches(block_summary, batch_format="pyarrow")
    summed = (partial.groupby(["value", "__is_err"])
              .aggregate(Sum("count_lo", alias_name="count_lo"))
              .materialize())
    errs = summed.filter(expr="__is_err == 1").to_pandas()
    total_err = int(errs["count_lo"].sum()) if len(errs) else 0

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["__is_err"] == 0].drop(columns="__is_err").copy()
        d["count_lo"] = d["count_lo"].astype("int64")
        d["count_hi"] = d["count_lo"] + np.int64(total_err)
        return d

    out = summed.map_batches(finish, batch_format="pandas")
    if min_count is not None:
        out = out.filter(expr=f"count_lo >= {min_count}")
    return out


def exact_heavy_hitters(ds, col: str, min_count: int, m: int = 256):
    """EXACT ``(value, n)`` for every value of ``col`` with true count
    ≥ ``min_count`` — without ever shuffling the vocabulary.

    Two passes (the "candidates are violation-sized" trick the
    referential check uses): (1) a Misra-Gries sweep produces the
    candidate set — guaranteed to contain every item with true count
    > Σ block truncation errors; (2) the few candidates are broadcast
    (``ray.put`` once) and ONE ``map_batches`` pass emits per-block
    exact partial counts for candidate values only (vectorized
    ``searchsorted`` membership), summed by a candidate-sized groupby.
    Output is exact and SQL-oracle-able (``GROUP BY col HAVING
    COUNT(*) >= min_count``).

    Raises if the MG error mass reaches ``min_count`` (the candidate
    set could then miss a true heavy hitter): retry with a larger
    ``m`` — error mass shrinks as 1/m.
    """
    import ray
    import ray.data as rd

    from ray.data.aggregate import Sum

    ds = ds.materialize()  # two passes over the same input
    cand_ds = approx_heavy_hitters(ds, col, m=m)
    cand = cand_ds.to_pandas()
    empty = pd.DataFrame({"value": pd.Series(dtype="object"),
                          "n": pd.Series(dtype="int64")})
    if not len(cand):
        return rd.from_pandas(empty)
    total_err = int((cand["count_hi"] - cand["count_lo"]).iloc[0])
    if total_err >= min_count:
        raise ValueError(
            f"exact_heavy_hitters: MG error mass {total_err} ≥ "
            f"min_count {min_count}; candidates may be incomplete — "
            f"increase m (got m={m})")
    # keep only candidates that could possibly reach min_count
    cand = cand[cand["count_hi"] >= min_count]
    if not len(cand):
        return rd.from_pandas(empty)
    cvals = np.sort(cand["value"].to_numpy().astype(str))
    ref = ray.put(cvals)

    def recount(b: pa.Table) -> pd.DataFrame:
        c = ray.get(ref)
        vc = pc.value_counts(b[col])
        vals = vc.field("values").to_pandas().astype(str).to_numpy()
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(
            np.int64)
        idx = np.clip(np.searchsorted(c, vals), 0, len(c) - 1)
        keep = c[idx] == vals
        return pd.DataFrame({"value": vals[keep], "n": cnts[keep]})

    exact = (ds.map_batches(recount, batch_format="pyarrow")
             .groupby("value").aggregate(Sum("n", alias_name="n"))
             .filter(expr=f"n >= {min_count}"))
    return exact
