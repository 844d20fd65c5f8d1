"""Contingency-table statistics — exact scaled-integer chi-square
independence audit between two categorical columns.

Plan: ONE combiner-fed hash ``groupby(a, b).count`` builds the
observed cell table (the only pass over the input); margins and the
statistic are computed over CELLS — |A|×|B| rows, assumed
driver-small (categorical × categorical; the regime of every
real independence audit).  Absent cells (o = 0) contribute their
expected mass like the textbook statistic — the full grid is
reconstructed from the margins.

Exactness: with N = Σo, row margins r_a and column margins c_b, each
cell's term is ``scale·(o·N − r_a·c_b)² // (r_a·c_b·N)`` in Python
ints (floor), summed over the full grid — the SQL oracle mirrors the
same per-cell floor with HUGEINT arithmetic, so the scaled statistic
is bit-identical.  (The statistic equals ``scale · Σ (o − e)²/e``
with ``e = r·c/N``, up to the documented per-cell floor.)

RAQC analog: SURVEY §2.9 F1 covers distribution drift between epochs
(PSI/KS); chi-square is the cross-COLUMN independence complement
(is event mix independent of weekday / source / shard — the
classic sanity check before stratified sampling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def mutual_information(ds, a_col: str, b_col: str, round_to: int = 6):
    """Single-row Dataset ``(n, cells, mi, g)``: mutual information
    (nats) and the G-test statistic between two categorical columns.

    Same ONE-pass cell-count plan as :func:`chi_square_independence`
    (the only scan of the input is the combiner-fed
    ``groupby(a, b).count``); only OBSERVED cells contribute (absent
    cells have ``o·ln(·) = 0`` in the limit, exactly as the textbook
    statistic).  ``mi = Σ (o/N)·ln(o·N/(r·c))``, ``g = 2·Σ
    o·ln(o·N/(r·c))`` — computed from exact int64 counts with the SAME
    float expression shape the SQL oracle uses (`LN` of the double
    quotient), rounded to ``round_to`` dp to absorb libm last-ulp and
    summation-order differences (q46-style discipline).

    RAQC analog: SURVEY §2.9 F1 is within-column drift; MI/G is the
    information-theoretic cross-column dependence audit (chi-square's
    complement — robust when expected counts are small).

    Domain: rows with a null in EITHER column are excluded (explicit
    filter, mirrored by the oracle's ``IS NOT NULL`` WHERE) — the
    statistic is over the observed joint distribution, and a null
    category would otherwise be silently dropped by the pandas
    combiner but kept by SQL ``GROUP BY``."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[a_col, b_col]].dropna()
        d = d.copy()
        d["__o"] = np.ones(len(d), dtype=np.int64)
        return d.groupby([a_col, b_col], sort=False, as_index=False).sum()

    cells = (ds.map_batches(block_counts, batch_format="pandas")
             .groupby([a_col, b_col])
             .aggregate(Sum("__o", alias_name="o"))
             .to_pandas())  # |A|×|B| rows — driver-small by contract

    ra = cells.groupby(a_col)["o"].sum()
    cb = cells.groupby(b_col)["o"].sum()
    n = float(cells["o"].sum())
    o = cells["o"].to_numpy(dtype=np.float64)
    r = cells[a_col].map(ra).to_numpy(dtype=np.float64)
    c = cells[b_col].map(cb).to_numpy(dtype=np.float64)
    # mirror the oracle's per-cell expression: LN((o*n)/(r*c))
    ln_ratio = np.log((o * n) / (r * c))
    mi = float(np.sum((o / n) * ln_ratio))
    g = float(2.0 * np.sum(o * ln_ratio))
    out = pd.DataFrame({
        "n": [np.int64(n)],
        "cells": [np.int64(len(cells))],
        "mi": [np.round(mi, round_to)],
        "g": [np.round(g, round_to)],
    })
    return rd.from_pandas(out)


def chi_square_independence(ds, a_col: str, b_col: str,
                            scale: int = 10 ** 6):
    """Single-row Dataset ``(n, cells, dof, chi2)``: the scaled
    chi-square statistic of independence between ``a_col`` and
    ``b_col`` (``chi2`` per the module's exact floor convention,
    ``dof = (|A|−1)(|B|−1)``, ``cells`` = observed non-zero cells).
    Null-key rows are excluded (same non-null domain contract as
    :func:`mutual_information`, oracle-mirrored)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[a_col, b_col]].dropna()
        d = d.copy()
        d["__o"] = np.ones(len(d), dtype=np.int64)
        return d.groupby([a_col, b_col], sort=False, as_index=False).sum()

    cells = (ds.map_batches(block_counts, batch_format="pandas")
             .groupby([a_col, b_col])
             .aggregate(Sum("__o", alias_name="o"))
             .to_pandas())  # |A|×|B| rows — driver-small by contract

    ra = cells.groupby(a_col)["o"].sum()
    cb = cells.groupby(b_col)["o"].sum()
    n = int(cells["o"].sum())
    obs = {(a, b): int(o) for a, b, o in
           zip(cells[a_col], cells[b_col], cells["o"])}
    chi2 = 0
    for a, r in ra.items():
        for b, c in cb.items():
            o = obs.get((a, b), 0)
            r, c = int(r), int(c)
            chi2 += (scale * (o * n - r * c) ** 2) // (r * c * n)
    out = pd.DataFrame({
        "n": [np.int64(n)],
        "cells": [np.int64(len(cells))],
        "dof": [np.int64((len(ra) - 1) * (len(cb) - 1))],
        "chi2": [np.int64(chi2)],
    })
    return rd.from_pandas(out)
