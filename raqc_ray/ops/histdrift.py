"""Exact cross-epoch histogram drift — the SQL-oracle-able companion
to the float PSI/KS drift check (`checks/drift.py`): given two corpus
luma histograms (`ops/lumahist` output, ≤ 256 rows each), compute the
EXACT normalized-L1 distance between the two distributions as an
integer rational:

    L1 = Σ_bins | na/Na − nb/Nb |
       = Σ_bins | na·Nb − nb·Na |  /  (Na·Nb)

The numerator and denominator are exact arbitrary-precision integers
(Python ints — at 10^12 images × 10^6 px the products leave int64, so
they are emitted as DECIMAL STRINGS; the totals stay int64).  Total
variation distance is L1/2; the caller can flag drift on the exact
rational ``l1_num > 2·eps·den`` without ever touching a float.

Scale shape: the INPUT reduction is the distributed part
(`luma_histogram` streams every pixel through per-block combiners);
this op consumes two ≤ 256-row tables — driver-side by design, like
the W2 histogram-window note in SURVEY §2.8.

Gates: closed-form unit tests (`test_histdrift`) and the end-to-end
driver oracle `q181_histdrift_documents` — two rendered epochs whose
histograms and exact L1 have a HUGEINT closed form in SQL.
"""

from __future__ import annotations

import pandas as pd


def _as_counts(hist) -> dict[int, int]:
    df = hist.to_pandas() if hasattr(hist, "to_pandas") else hist
    return {int(b): int(n) for b, n in zip(df["bin"], df["n_px"])}


def histogram_l1(hist_a, hist_b) -> pd.DataFrame:
    """One-row frame ``(na_total, nb_total, l1_num, l1_den)`` — the
    exact normalized-L1 drift between two ``(bin, n_px)`` histograms
    (Datasets or pandas).  ``l1_num``/``l1_den`` are decimal strings
    (exact beyond int64); empty histograms raise ValueError."""
    ca, cb = _as_counts(hist_a), _as_counts(hist_b)
    na_total = sum(ca.values())
    nb_total = sum(cb.values())
    if na_total == 0 or nb_total == 0:
        raise ValueError("histogram_l1: empty histogram")
    num = 0
    for b in ca.keys() | cb.keys():
        num += abs(ca.get(b, 0) * nb_total - cb.get(b, 0) * na_total)
    return pd.DataFrame({
        "na_total": pd.Series([na_total], dtype="int64"),
        "nb_total": pd.Series([nb_total], dtype="int64"),
        "l1_num": [str(num)],
        "l1_den": [str(na_total * nb_total)],
    })
