"""Distributed exact rank statistics per group — Spearman correlation
and ROC-AUC (Mann-Whitney U), both with average-rank tie handling,
computed from value histograms, never from a per-row sort of the
input.

Shared plan (two regimes, size-triggered like ``checks/neardup``):

1. marginal value histograms ``(key, value) → count`` via block
   partials + ONE hash groupby — these DO compress (distinct values
   per key ≪ rows in the quantized-measure regime this exact path
   targets; continuous high-cardinality measures belong to the
   t-digest path);
2. per-key integer ranks over each marginal (cumsum over histogram
   rows only; ``map_groups`` over histogram rows).  Doubled average
   ranks keep ties integral; Spearman additionally CENTERS them
   (``Σc·D = 0``) so only second moments matter;
3. **broadcast regime** (default): the rank tables are small, so they
   broadcast via :func:`raqc_ray.ops.join.broadcast_join` (``ray.put``
   once, zero-copy per task) and the raw stream maps straight to
   per-block per-key moment partials, re-summed per key by the
   sorted-block ``vhist.grouped_sums`` plan (Ray's native Sum
   aggregate measured 141 s at 1.28M partials / 20k keys —
   BASELINE.md round-5).  NO row-scale shuffle anywhere.  (Measured: the
   previous joint-histogram plan shuffled ~9M partial rows for a 10M
   spearman input and spent 930 s in Ray's aggregate reduce; the
   broadcast plan removes that stage entirely — BASELINE.md round-4
   ops bench.)
4. **join regime** (rank tables above ``broadcast_limit`` rows): fall
   back to aggregating the joint histogram and mapping ranks on with
   distributed hash joins — the exchange is then histogram-scale,
   which is the best exact plan when marginals don't fit a worker.

Exactness: moment partials are int64 (|term| ≤ n³ per key — exact
for keys up to ~2·10⁶ rows; the global re-sum is Python-int exact);
the final float steps (CAST exact integers to DOUBLE, multiply,
sqrt, divide) are mirrored token-for-token by the SQL oracles —
IEEE-deterministic, bit-identical floats.

RAQC analog: SURVEY §2.5 A6 covers Pearson (q46); Spearman/AUC are
its robust rank complements (monotone-dependence and
label-separability audits).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _value_ranks(ds, key: str, col: str, rank_col: str,
                 centered: bool):
    """(key, col, rank_col) from the RAW stream: centered doubled
    average rank (``2·below + c − n``) or plain doubled average rank
    (``2·below + c + 1``) of each distinct ``col`` value within its
    key.

    Round-5 port (VERDICT r4 #1): block count partials feed ONE
    ``scan_sorted_groups`` pass; duplicate ``(key, col)`` partial rows
    are merged in-segment (ranks need the global per-value count)
    instead of via the old hash ``groupby([key, col])`` aggregate +
    task-per-key ``map_groups``."""
    from .groupscan import scan_sorted_groups
    from .vhist import (gather_segments, key_pandas_dtype, merge_runs,
                        seg_bounds_of)

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, col]].copy()
        d["__c"] = np.ones(len(d), dtype=np.int64)
        return d.groupby([key, col], sort=False, as_index=False).sum()

    marg = ds.map_batches(block_counts, batch_format="pandas")

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        # boundary groups carry unmerged partials — merge first
        s = (g.groupby(col, as_index=False)["__c"].sum()
             .sort_values(col, kind="mergesort"))
        c = s["__c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        below = np.concatenate([[0], np.cumsum(c)[:-1]])
        r = 2 * below + c - n if centered else 2 * below + c + 1
        return pd.DataFrame({key: np.repeat(g[key].iloc[0], len(c)),
                             col: s[col].to_numpy(),
                             rank_col: r.astype(np.int64)})

    def block_fn(df: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        idx, segid, sizes, cum_excl = gather_segments(starts, ends)
        kv_seg = df[key].to_numpy()[starts]
        v = df[col].to_numpy()[idx]
        c = df["__c"].to_numpy(dtype=np.int64)[idx]
        order = np.lexsort((v, segid))
        _, seg_m, v_m, c_m = merge_runs(segid, v[order], c[order])
        sm_starts, sm_sizes = seg_bounds_of(seg_m, len(sizes))
        cumm = np.cumsum(c_m)
        base = np.where(sm_starts > 0, cumm[sm_starts - 1], 0)
        n = cumm[sm_starts + sm_sizes - 1] - base
        below = cumm - c_m - np.repeat(base, sm_sizes)
        if centered:
            r = 2 * below + c_m - np.repeat(n, sm_sizes)
        else:
            r = 2 * below + c_m + 1
        return pd.DataFrame({key: np.repeat(kv_seg, sm_sizes),
                             col: v_m,
                             rank_col: r.astype(np.int64)})

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        col: pd.Series(dtype=key_pandas_dtype(ds, col)),
        rank_col: pd.Series(dtype="int64")})
    return scan_sorted_groups(marg, key, ranks, out_empty, min_group=1,
                              block_fn=block_fn)


def _join_regime(ds, key: str, cols: list[str], rank_tables,
                 carry_cols=()):
    """Fallback: aggregate the joint histogram (sorted-block
    ``grouped_sums`` over the composite key — the native aggregate on
    this many-groups pandas-block stream was the measured r4 wall),
    then distributed hash joins map each rank table on.
    ``carry_cols`` are part of the joint distribution (AUC's label)
    but have no rank table to join.  Returns (joined_ds, count_col)."""
    from .join import hash_join
    from .vhist import grouped_sums

    gb = [key] + cols + list(carry_cols)

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df[gb].copy()
        d["__c"] = np.ones(len(d), dtype=np.int64)
        return d.groupby(gb, sort=False, as_index=False).sum()

    j = grouped_sums(
        ds.map_batches(block_counts, batch_format="pandas"),
        gb, ("__c",))
    for col, rt in rank_tables:
        j = hash_join(j, rt, on=(key, col))
    return j, "__c"


def _map_ranks(ds, key: str, rank_tables, broadcast_limit: int,
               carry_cols=()):
    """Attach rank columns to the raw stream (broadcast regime) or to
    the joint histogram (join regime).  Returns (ds, count_col|None).

    Broadcast regime uses the ARROW-native map-side join
    (``broadcast_join_arrow``): the rank table is read zero-copy from
    the object store and each batch joins in Acero — the pandas
    ``merge`` variant re-deserialized and re-hashed the 2M+-row table
    per task and was measured as ~95% of the spearman wall at 10M
    rows (BASELINE.md round-5)."""
    import pyarrow as pa

    from .join import broadcast_join_arrow

    mats = [(col, rt.materialize()) for col, rt in rank_tables]
    total = sum(rt.count() for _, rt in mats)
    if total <= broadcast_limit:
        out = ds
        for col, rt in mats:
            tbl = pa.concat_tables(
                [b for b in rt.iter_batches(batch_size=None,
                                            batch_format="pyarrow")]
            ) if rt.count() else pa.Table.from_pandas(rt.to_pandas())
            out = broadcast_join_arrow(out, tbl, on=[key, col])
        return out, None
    cols = [col for col, _ in mats]
    return _join_regime(ds, key, cols, mats, carry_cols)


def grouped_spearman(ds, key: str, x_col: str, y_col: str,
                     broadcast_limit: int = 2_000_000):
    """One row per key: ``(key, n, rho)`` — exact Spearman ρ of
    (x, y) with average-rank tie handling.  Keys where either column
    is constant report ``rho = 0.0`` (zero variance — the SQL
    NULLIF-to-0 convention)."""
    from .vhist import grouped_sums

    # materialize: the two marginal passes and the moment pass must
    # see ONE consistent execution of the upstream lineage
    ds = ds.materialize()
    rx = _value_ranks(ds, key, x_col, "__rx", centered=True)
    ry = _value_ranks(ds, key, y_col, "__ry", centered=True)
    j, cnt = _map_ranks(ds, key, [(x_col, rx), (y_col, ry)],
                        broadcast_limit)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        c = (df[cnt].to_numpy(dtype=np.int64) if cnt
             else np.ones(len(df), dtype=np.int64))
        dx = df["__rx"].to_numpy(dtype=np.int64)
        dy = df["__ry"].to_numpy(dtype=np.int64)
        d = pd.DataFrame({
            key: df[key], "n": c,
            "sxx": c * dx * dx, "syy": c * dy * dy,
            "sxy": c * dx * dy,
        })
        return d.groupby(key, sort=False, as_index=False).sum()

    # per-key re-sum of the block partials via the sorted-block plan —
    # Ray's native Sum aggregate measured 141 s at 1.28M partials /
    # 20k keys (BASELINE.md round-5); this is ~2 s
    agg = grouped_sums(j.map_batches(moments, batch_format="pandas"),
                       key, ("n", "sxx", "syy", "sxy"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rows = {key: df[key], "n": [], "rho": []}
        for n, sxx, syy, sxy in zip(df["n"], df["sxx"], df["syy"],
                                    df["sxy"]):
            sxx, syy = int(sxx), int(syy)
            rows["n"].append(np.int64(int(n)))
            rows["rho"].append(
                float(int(sxy)) / math.sqrt(float(sxx) * float(syy))
                if sxx and syy else 0.0)
        return pd.DataFrame(rows)

    return agg.map_batches(finish, batch_format="pandas")


def grouped_auc(ds, key: str, label_col: str, score_col: str,
                scale: int = 10 ** 6, broadcast_limit: int = 2_000_000):
    """Exact per-key ROC-AUC (Mann-Whitney U with average-rank ties)
    as a scaled integer: one row ``(key, n_pos, n_neg, auc)`` with
    ``auc = scale·(ΣR₂₊ − n₊(n₊+1)) // (2·n₊·n₋)`` where ``R₂`` is
    the DOUBLED average rank of the score within the key and ``ΣR₂₊``
    sums it over positive rows.  Keys lacking either class report
    ``auc = 0``.  ``label_col`` must be 0/1 int."""
    from .vhist import grouped_sums

    ds = ds.materialize()
    rk = _value_ranks(ds, key, score_col, "__r2", centered=False)
    # the label is part of the joint distribution the fallback
    # histogram must keep (pre-r5 the join regime dropped it and
    # crashed — caught by the regime-equivalence test)
    j, cnt = _map_ranks(ds, key, [(score_col, rk)], broadcast_limit,
                        carry_cols=(label_col,))

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        c = (df[cnt].to_numpy(dtype=np.int64) if cnt
             else np.ones(len(df), dtype=np.int64))
        lab = df[label_col].to_numpy(dtype=np.int64)
        r2 = df["__r2"].to_numpy(dtype=np.int64)
        d = pd.DataFrame({
            key: df[key],
            "n_pos": c * lab, "n_neg": c * (1 - lab),
            "sr2": c * lab * r2,
        })
        return d.groupby(key, sort=False, as_index=False).sum()

    agg = grouped_sums(j.map_batches(moments, batch_format="pandas"),
                       key, ("n_pos", "n_neg", "sr2"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rows = {key: df[key], "n_pos": [], "n_neg": [], "auc": []}
        for np_, nn, sr2 in zip(df["n_pos"], df["n_neg"], df["sr2"]):
            np_, nn, sr2 = int(np_), int(nn), int(sr2)
            rows["n_pos"].append(np.int64(np_))
            rows["n_neg"].append(np.int64(nn))
            rows["auc"].append(np.int64(
                (scale * (sr2 - np_ * (np_ + 1))) // (2 * np_ * nn)
                if np_ and nn else 0))
        return pd.DataFrame(rows)

    return agg.map_batches(finish, batch_format="pandas")
