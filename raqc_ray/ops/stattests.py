"""Grouped Welch's t-test — each key's value distribution vs the REST
of the data — from EXACT integer moments with a bit-reproducible float
epilogue.

Plan (the `ops/moments.py` combiner shape, integer-cents discipline):
one ``map_batches`` collapses each block to ``(key, n, Σv, Σv²)``
int64 partials over ``v = floor(value*scale + 0.5)``; ONE keys-sized
hash ``groupby(key)`` sums them (Ray's Sum accumulates int64 partials
in Python ints — exact); the Welch statistic is then a handful of
Python-int products per key finished by IEEE-correctly-rounded
conversions and ONE division/sqrt chain::

    t = (A/D) / sqrt(f_key + f_rest)
    A = S_k*n_r - S_r*n_k          D = n_k*n_r          (exact ints)
    f_g = float(n_g*Q_g - S_g**2) / float(n_g*n_g*(n_g-1))

Because every float is produced by a correctly-rounded conversion or
arithmetic op on EXACTLY the same integers the SQL oracle computes
(HUGEINT → DOUBLE casts), engine and DuckDB agree bit-for-bit before
the final round — no accumulation-order sensitivity anywhere.

Overflow bound: Σv² must fit int64 — at cents scale (|v| ≤ 5·10⁴)
that holds to ~4·10⁹ rows; beyond, lower ``scale`` or shard the
reduce.  (Same documented guard as `ops/kstest.py`.)

RAQC analog: none — SURVEY §2 training-data surface (distribution
shift screens; completes the exact stat-test family: chi²
independence `ops/contingency.py`, exact KS `ops/kstest.py`).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

__all__ = ["grouped_welch_vs_rest"]


def grouped_welch_vs_rest(ds, key: str, value_col: str,
                          scale: int = 100, round_to: int = 9):
    """Dataset ``(key, n_key, t_welch)`` — one row per key value with
    ``n_key ≥ 2`` and ``n_rest ≥ 2``; ``t_welch`` is Welch's
    two-sample t statistic of the key's scaled values against the
    pooled rest, rounded to ``round_to``.  Null keys/values dropped."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[key, value_col])
        vi = np.floor(
            d[value_col].to_numpy(dtype=np.float64) * scale + 0.5
        ).astype(np.int64)
        out = pd.DataFrame({
            key: d[key].astype(str),
            "__n": np.ones(len(d), dtype=np.int64),
            "__s": vi,
            "__q": vi * vi,
        })
        return out.groupby(key, sort=False, as_index=False).sum()

    agg = (ds.map_batches(partials, batch_format="pandas")
           .groupby(key)
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ("__n", "__s", "__q")])
           .to_pandas())

    n_all = int(agg["__n"].sum())
    s_all = int(agg["__s"].sum())
    q_all = int(agg["__q"].sum())

    rows = []
    for k, n1, s1, q1 in zip(agg[key], agg["__n"], agg["__s"],
                             agg["__q"]):
        n1, s1, q1 = int(n1), int(s1), int(q1)
        n2, s2, q2 = n_all - n1, s_all - s1, q_all - q1
        if n1 < 2 or n2 < 2:
            continue
        a = s1 * n2 - s2 * n1                      # exact int
        d = n1 * n2
        f1 = float(n1 * q1 - s1 * s1) / float(n1 * n1 * (n1 - 1))
        f2 = float(n2 * q2 - s2 * s2) / float(n2 * n2 * (n2 - 1))
        t = (float(a) / float(d)) / math.sqrt(f1 + f2)
        rows.append((k, n1, t))

    out = pd.DataFrame(rows, columns=[key, "n_key", "t_welch"])
    out[key] = out[key].astype(str)
    out["n_key"] = out["n_key"].astype("int64")
    out["t_welch"] = np.round(out["t_welch"].to_numpy(dtype=np.float64),
                              round_to)
    return rd.from_pandas(out.sort_values(key).reset_index(drop=True))
