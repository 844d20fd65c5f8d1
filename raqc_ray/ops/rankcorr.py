"""Distributed exact Spearman rank correlation per group — average
(fractional) ranks with ties, computed from histograms, never from a
per-row sort of the input.

Plan (every stage a narrow combiner-fed exchange, nothing row-scale
on the driver and no whole-group sort):

1. joint value histogram: ``(key, x, y) → c`` via block partials +
   ONE hash groupby — the only pass over the input stream;
2. marginal histograms ``(key, x) → cx`` / ``(key, y) → cy`` derived
   from the joint table (orders of magnitude smaller than the input);
3. per-key CENTERED DOUBLED average ranks over each marginal —
   ``D = 2·(count below) + (count equal) − n``, an integer in
   ``[−n, n]`` with ``Σc·D = 0`` by construction, computed by a
   cumsum over the key's histogram rows (``map_groups`` over
   histogram rows only).  Doubling keeps tie-averaged ranks integral;
   centering cancels the first moments so ``ρ = Sxy/√(Sxx·Syy)``;
4. two distributed hash joins map the ranks back onto the joint
   histogram; block partials accumulate ``Σc·Dx·Dy, Σc·Dx², Σc·Dy²``
   in int64 — |term| ≤ n³ per key, exact for keys up to ~2·10⁶ rows
   (beyond that scale the t-digest/approx-rank path is the right
   tool; the global re-sum is Python-int exact either way);
5. per-key finish: the final float steps (CAST each exact integer to
   DOUBLE, multiply, sqrt, divide) are mirrored token-for-token by
   the SQL oracle — IEEE-deterministic, bit-identical floats.

RAQC analog: SURVEY §2.5 A6 covers Pearson (q46); Spearman is its
robust rank complement for monotone-dependence checks between
columns (w vs byte-length style audits).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _marginal_ranks(joint, key: str, col: str, cnt: str, rank_col: str):
    """(key, col, rank_col): centered doubled average rank of each
    distinct ``col`` value within its key, from the (key, col)
    marginal of the joint histogram."""
    from ray.data.aggregate import Sum

    def block(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, col, cnt]].copy()
        return d.groupby([key, col], sort=False, as_index=False).sum()

    marg = (joint.map_batches(block, batch_format="pandas")
            .groupby([key, col]).aggregate(Sum(cnt, alias_name="__m")))

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(col, kind="mergesort")
        c = s["__m"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        below = np.concatenate([[0], np.cumsum(c)[:-1]])
        return pd.DataFrame({key: s[key].to_numpy(),
                             col: s[col].to_numpy(),
                             rank_col: (2 * below + c - n)
                             .astype(np.int64)})

    return marg.groupby(key).map_groups(ranks, batch_format="pandas")


def grouped_auc(ds, key: str, label_col: str, score_col: str,
                scale: int = 10 ** 6):
    """Exact per-key ROC-AUC (Mann-Whitney U with average-rank ties)
    as a scaled integer: one row ``(key, n_pos, n_neg, auc)`` with
    ``auc = scale·(ΣR₂₊ − n₊(n₊+1)) // (2·n₊·n₋)`` where ``R₂`` is
    the DOUBLED average rank of the score within the key (integer by
    construction) and ``ΣR₂₊`` sums it over positive rows.  Keys
    lacking either class report ``auc = 0``.

    Plan (all histogram-scale): joint ``(key, label, score)`` counts
    via ONE combiner-fed groupby; score-marginal doubled ranks per
    key (cumsum over histogram rows); one distributed hash join maps
    ranks back; the positive-side moment sum reduces per key.
    ``label_col`` must be 0/1 int."""
    from ray.data.aggregate import Sum

    from .join import hash_join

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, label_col, score_col]].copy()
        d["__c"] = np.ones(len(d), dtype=np.int64)
        return d.groupby([key, label_col, score_col], sort=False,
                         as_index=False).sum()

    joint = (ds.map_batches(block_counts, batch_format="pandas")
             .groupby([key, label_col, score_col])
             .aggregate(Sum("__c", alias_name="__c"))).materialize()

    def marg(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, score_col, "__c"]].copy()
        return d.groupby([key, score_col], sort=False,
                         as_index=False).sum()

    marg_ds = (joint.map_batches(marg, batch_format="pandas")
               .groupby([key, score_col])
               .aggregate(Sum("__c", alias_name="__m")))

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(score_col, kind="mergesort")
        c = s["__m"].to_numpy(dtype=np.int64)
        below = np.concatenate([[0], np.cumsum(c)[:-1]])
        return pd.DataFrame({key: s[key].to_numpy(),
                             score_col: s[score_col].to_numpy(),
                             "__r2": (2 * below + c + 1)
                             .astype(np.int64)})

    rk = marg_ds.groupby(key).map_groups(ranks, batch_format="pandas")
    j = hash_join(joint, rk, on=(key, score_col))

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        c = df["__c"].to_numpy(dtype=np.int64)
        lab = df[label_col].to_numpy(dtype=np.int64)
        r2 = df["__r2"].to_numpy(dtype=np.int64)
        d = pd.DataFrame({
            key: df[key],
            "n_pos": c * lab, "n_neg": c * (1 - lab),
            "sr2": c * lab * r2,
        })
        return d.groupby(key, sort=False, as_index=False).sum()

    agg = (j.map_batches(moments, batch_format="pandas")
           .groupby(key)
           .aggregate(Sum("n_pos", alias_name="n_pos"),
                      Sum("n_neg", alias_name="n_neg"),
                      Sum("sr2", alias_name="sr2")))

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


def grouped_spearman(ds, key: str, x_col: str, y_col: str):
    """One row per key: ``(key, n, rho)`` — exact Spearman ρ of
    (x, y) with average-rank tie handling.  Keys where either column
    is constant report ``rho = 0.0`` (zero variance — the SQL
    NULLIF-to-0 convention)."""
    from ray.data.aggregate import Sum

    from .join import hash_join

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, x_col, y_col]].copy()
        d["__c"] = np.ones(len(d), dtype=np.int64)
        return d.groupby([key, x_col, y_col], sort=False,
                         as_index=False).sum()

    # materialize: three consumers (two marginals + the join probe)
    # must see ONE consistent execution of the upstream lineage
    joint = (ds.map_batches(block_counts, batch_format="pandas")
             .groupby([key, x_col, y_col])
             .aggregate(Sum("__c", alias_name="__c"))).materialize()

    rx = _marginal_ranks(joint, key, x_col, "__c", "__rx")
    ry = _marginal_ranks(joint, key, y_col, "__c", "__ry")
    j = hash_join(hash_join(joint, rx, on=(key, x_col)), ry,
                  on=(key, y_col))

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        c = df["__c"].to_numpy(dtype=np.int64)
        dx = df["__rx"].to_numpy(dtype=np.int64)
        dy = df["__ry"].to_numpy(dtype=np.int64)
        d = pd.DataFrame({
            key: df[key], "n": c,
            "sxx": c * dx * dx, "syy": c * dy * dy,
            "sxy": c * dx * dy,
        })
        return d.groupby(key, sort=False, as_index=False).sum()

    agg = (j.map_batches(moments, batch_format="pandas")
           .groupby(key)
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ("n", "sxx", "syy", "sxy")]))

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
