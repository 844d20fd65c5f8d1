"""Benford first-significant-digit census — the classic
data-integrity screen (Benford 1938; Nigrini's forensic-accounting
test): fabricated or systematically corrupted numeric columns diverge
from the log10(1 + 1/d) first-digit law, so a grouped digit histogram
is a cheap one-pass anomaly signal over any money-like column.

Pure integer end-to-end: values quantize to ``floor(v)`` int64 (the
first significant digit of a >= 1 value is invariant to the
fractional part) and the digit extraction is a WHILE loop over digit
COUNT (<= 19 for int64), each step one vectorized ``//10`` over the
rows that still have >= 2 digits — no per-row Python, no float log10
(whose boundary error at exact powers of ten would flip digits).

Plan shape: per-block ``(key, digit) -> count`` partials collapse
each block to <= 9*K rows, then ONE small hash ``groupby`` — the
pre-aggregate-then-shuffle discipline every census op here shares.

Input contract: values >= 1 (first digit of 0 is undefined); the op
filters v < 1 rows out, mirroring the oracle's WHERE clause.

RAQC analog: none — SURVEY §2 training-data surface (column-level
quality screens; the distributional sibling of the nullity/range
masks M3/M4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["benford_digit_census"]


def benford_digit_census(ds, key: str, value_col: str):
    """Dataset ``(key, digit, n)`` — count of rows per key whose
    ``floor(value_col)`` has first significant digit ``digit`` (1-9);
    rows with value < 1 are excluded."""
    from ray.data.aggregate import Sum

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        v = np.floor(df[value_col].to_numpy(dtype=np.float64)) \
            .astype(np.int64)
        keep = v >= 1
        v = v[keep]
        # strip trailing digits until single-digit: <= 19 vectorized
        # passes total, each over the still-wide subset only
        while True:
            wide = v >= 10
            if not wide.any():
                break
            v = np.where(wide, v // 10, v)
        d = pd.DataFrame({key: df[key].to_numpy()[keep], "digit": v})
        out = (d.groupby([key, "digit"], sort=False)
               .size().rename("n").reset_index())
        out["digit"] = out["digit"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    return (ds.map_batches(partials, batch_format="pandas")
            .groupby([key, "digit"])
            .aggregate(Sum("n", alias_name="n")))
