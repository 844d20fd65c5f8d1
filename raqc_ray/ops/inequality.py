"""Exact grouped inequality / concentration indices — Gini coefficient
and Herfindahl-Hirschman index, both as scaled integers.

Both ride the value-histogram plan (:mod:`raqc_ray.ops.quantile_exact`):
``map_batches`` reduces each block to ``(key, value) → count`` (or to
``(key, Σv, Σv²)`` moment partials for HHI), ONE hash ``groupby``
makes the partials global, and the per-key finish runs over histogram
rows — distinct values × keys, never input rows.  Every arithmetic
step after the histogram is Python-int exact (arbitrary precision), so
the scaled-integer outputs are layout-invariant and bit-identical to
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
    from ray.data.aggregate import Sum

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, value_col]].copy()
        d["__c"] = np.ones(len(d), dtype=np.int64)
        return d.groupby([key, value_col], sort=False, as_index=False).sum()

    hist = (ds.map_batches(block_counts, batch_format="pandas")
            .groupby([key, value_col])
            .aggregate(Sum("__c", alias_name="__c")))

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

    return hist.groupby(key).map_groups(pick, batch_format="pandas")


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

    Same value-histogram plan as Gini (the only pass over the input
    is the per-block ``(key, value) → count`` combiner); ``n`` and
    ``total`` are exact int64, the ln epilogue runs over CELLS with
    the same expression shape as the SQL oracle's per-row form
    (mathematically equal; float spread ≪ the 6dp round, q46
    discipline)."""
    from ray.data.aggregate import Sum

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.int64)
        m = v > 0
        d = pd.DataFrame({key: df[key].to_numpy()[m]})
        d[value_col] = v[m]
        d["__c"] = np.ones(int(m.sum()), dtype=np.int64)
        return d.groupby([key, value_col], sort=False,
                         as_index=False).sum()

    hist = (ds.map_batches(block_counts, batch_format="pandas")
            .groupby([key, value_col])
            .aggregate(Sum("__c", alias_name="__c")))

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

    return hist.groupby(key).map_groups(pick, batch_format="pandas")
