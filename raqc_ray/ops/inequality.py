"""Exact grouped inequality / concentration indices — Gini coefficient
and Herfindahl-Hirschman index, both as scaled integers.

Both ride the value-histogram plan (:mod:`raqc_ray.ops.quantile_exact`):
``map_batches`` reduces each block to ``(key, value) → count`` (or to
``(key, Σv, Σv²)`` moment partials for HHI).  Since round 5 (VERDICT
r4 #1) Gini and Theil feed the partials straight into the ONE-sort
``scan_sorted_groups`` plan — no ``groupby([key, value])`` hash
aggregate, no task-per-key ``map_groups``; the Gini rank-sum term
``v·c·(2p + c − n)`` is ADDITIVE under run splits (splitting a run of
equal values between partial rows leaves the sum unchanged —
substitute c = c₁ + c₂ and expand), so duplicate partial rows need no
pre-merge.  Every arithmetic step after the histogram is Python-int
exact (object-dtype reductions = arbitrary precision), so the
scaled-integer outputs are layout-invariant and bit-identical to
the SQL window oracles — the same determinism discipline as
``grouped_weighted_median`` / q120's share column.

Value domain: non-negative integers (cents / counts).  Negative values
would make the Gini denominator meaningless (index undefined); callers
scale floats to cents first.

RAQC analog: none (SURVEY §2.5 stops at percentile outliers); part of
the §2 training-data-pipeline surface (source-concentration and
length-inequality audits over a corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def grouped_gini(ds, key: str, value_col: str, scale: int = 10 ** 9):
    """One row per key: ``(key, n, total, gini)`` where ``gini`` is the
    exact Gini coefficient of the key's (non-negative integer) values,
    scaled: ``gini = scale * Σᵢ (2i − n − 1)·xᵢ // (n · Σx)`` over the
    ascending sort (1-based ``i``).  The rank sum is computed from the
    value histogram: a run of ``c`` equal values ``v`` starting after
    cumulative count ``p`` contributes ``v·c·(2p + c − n)`` — invariant
    to tie order because tied values are equal.  Keys with zero total
    report ``gini = 0``."""
    from .groupscan import scan_sorted_groups
    from .vhist import gather_segments, key_pandas_dtype

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, value_col]].copy()
        d["__c"] = np.ones(len(d), dtype=np.int64)
        return d.groupby([key, value_col], sort=False, as_index=False).sum()

    hist = ds.map_batches(block_counts, batch_format="pandas")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(value_col, kind="mergesort")
        v = s[value_col].to_numpy()
        c = s["__c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        # p = cumulative count strictly before each run (int64-safe:
        # p ≤ n); the rank-sum terms go through object dtype = Python
        # ints, so the reduction is exact at any magnitude
        p = np.concatenate([[0], np.cumsum(c)[:-1]])
        vo = v.astype(object)
        co = c.astype(object)
        num = int((vo * co * (2 * p.astype(object) + co - n)).sum())
        total = int((vo * co).sum())
        den = n * total
        gini = (scale * num) // den if den else 0
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n": [np.int64(n)],
                             "total": [np.int64(total)],
                             "gini": [np.int64(gini)]})

    def block_fn(df: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        idx, segid, sizes, cum_excl = gather_segments(starts, ends)
        kv_seg = df[key].to_numpy()[starts]
        v = df[value_col].to_numpy()[idx]
        c = df["__c"].to_numpy(dtype=np.int64)[idx]
        order = np.lexsort((v, segid))
        v, c = v[order], c[order]
        cumg = np.cumsum(c)
        base = np.where(cum_excl > 0, cumg[cum_excl - 1], 0)
        n = cumg[cum_excl + sizes - 1] - base
        # within-seg cumulative count strictly before each run
        p = cumg - c - np.repeat(base, sizes)
        # object-dtype terms: Python-int exact at any magnitude (the
        # scaled products overflow int64 long before real scales)
        vo = v.astype(object)
        co = c.astype(object)
        terms = vo * co * (2 * p.astype(object) + co
                           - np.repeat(n, sizes).astype(object))
        num = np.add.reduceat(terms, cum_excl)
        tot = np.add.reduceat(vo * co, cum_excl)
        gini = np.fromiter(
            ((scale * int(a)) // (int(nn) * int(t)) if nn and t else 0
             for a, nn, t in zip(num, n, tot)),
            dtype=np.int64, count=len(kv_seg))
        return pd.DataFrame({
            key: kv_seg, "n": n.astype(np.int64),
            "total": np.fromiter((int(t) for t in tot), dtype=np.int64,
                                 count=len(kv_seg)),
            "gini": gini})

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        "n": pd.Series(dtype="int64"),
        "total": pd.Series(dtype="int64"),
        "gini": pd.Series(dtype="int64")})
    return scan_sorted_groups(hist, key, pick, out_empty, min_group=1,
                              block_fn=block_fn)


def grouped_hhi(ds, key: str, count_col: str, scale: int = 10 ** 8):
    """One row per key: ``(key, k, total, hhi)`` where ``hhi`` is the
    Herfindahl-Hirschman concentration of ``count_col`` shares within
    the key, scaled exactly: ``hhi = scale * Σc² // (Σc)²`` (k = number
    of share-holders, total = Σc).  Input rows are already one per
    (key, holder) — e.g. the output of a per-(key, entity) count
    groupby.  Partials are moment sums ``(Σc, Σc²)`` per block, so the
    exchange is keys × blocks rows; the int64 partial bound is
    ``Σc² < 2⁶³`` per block (c ≤ 3·10⁹ rows per holder — far above any
    real corpus; the global re-sum is Python-int exact)."""
    from ray.data.aggregate import Sum

    if key == "k":
        raise ValueError("grouped_hhi: key column may not be named 'k' "
                         "(clashes with the holder-count output column)")

    def block_moments(df: pd.DataFrame) -> pd.DataFrame:
        c = df[count_col].to_numpy(dtype=np.int64)
        d = pd.DataFrame({key: df[key], "__s1": c, "__s2": c * c,
                          "__k": np.ones(len(df), dtype=np.int64)})
        return d.groupby(key, sort=False, as_index=False).sum()

    agg = (ds.map_batches(block_moments, batch_format="pandas")
           .groupby(key)
           .aggregate(Sum("__s1", alias_name="s1"),
                      Sum("__s2", alias_name="s2"),
                      Sum("__k", alias_name="k")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        hhi = [np.int64((scale * int(s2)) // (int(s1) * int(s1)))
               if int(s1) else np.int64(0)
               for s1, s2 in zip(df["s1"], df["s2"])]
        return pd.DataFrame({key: df[key],
                             "k": df["k"].astype("int64"),
                             "total": df["s1"].astype("int64"),
                             "hhi": pd.Series(hhi, dtype="int64")})

    return agg.map_batches(finish, batch_format="pandas")


def grouped_theil(ds, key: str, value_col: str, round_to: int = 6):
    """One row per key: ``(key, n, total, theil)`` — the Theil-T
    inequality index ``(1/n)·Σ (x/μ)·ln(x/μ)`` over the key's
    POSITIVE integer values (x ≤ 0 is outside the index's domain and
    is filtered, oracle-mirrored) — the entropy-based complement of
    :func:`grouped_gini` (Theil decomposes across subgroups; Gini
    does not).  0 ⇒ perfect equality, ln(n) ⇒ one value holds all.

    Same value-histogram + ONE-sort scan plan as Gini (the only pass
    over the input is the per-block ``(key, value) → count``
    combiner); duplicate partial rows are tolerated because each cell
    term ``c·(v/μ)·ln(v/μ)`` is linear in ``c``.  ``n`` and ``total``
    are exact int64, the ln epilogue runs over CELLS with the same
    expression shape as the SQL oracle's per-row form (mathematically
    equal; float spread ≪ the 6dp round, q46 discipline)."""
    from .groupscan import scan_sorted_groups
    from .vhist import gather_segments, key_pandas_dtype

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.int64)
        m = v > 0
        d = pd.DataFrame({key: df[key].to_numpy()[m]})
        d[value_col] = v[m]
        d["__c"] = np.ones(int(m.sum()), dtype=np.int64)
        return d.groupby([key, value_col], sort=False,
                         as_index=False).sum()

    hist = ds.map_batches(block_counts, batch_format="pandas")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        v = g[value_col].to_numpy(dtype=np.int64)
        c = g["__c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        tot = int((v * c).sum())
        mu = tot / float(n)
        vr = v / mu
        theil = float((c * (vr * np.log(vr))).sum() / n)
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n": [np.int64(n)],
                             "total": [np.int64(tot)],
                             "theil": [np.round(theil, round_to)]})

    def block_fn(df: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        idx, segid, sizes, cum_excl = gather_segments(starts, ends)
        kv_seg = df[key].to_numpy()[starts]
        v = df[value_col].to_numpy(dtype=np.int64)[idx]
        c = df["__c"].to_numpy(dtype=np.int64)[idx]
        order = np.lexsort((v, segid))
        v, c = v[order], c[order]
        n = np.add.reduceat(c, cum_excl)
        tot = np.add.reduceat(v * c, cum_excl)
        mu_rep = np.repeat(tot / n.astype(np.float64), sizes)
        vr = v / mu_rep
        theil = (np.add.reduceat(c * (vr * np.log(vr)), cum_excl)
                 / n.astype(np.float64))
        return pd.DataFrame({key: kv_seg, "n": n.astype(np.int64),
                             "total": tot.astype(np.int64),
                             "theil": np.round(theil, round_to)})

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        "n": pd.Series(dtype="int64"),
        "total": pd.Series(dtype="int64"),
        "theil": pd.Series(dtype="float64")})
    return scan_sorted_groups(hist, key, pick, out_empty, min_group=1,
                              block_fn=block_fn)
