"""Grouped threshold-vs-mean outlier filter, exact integer arithmetic.

Flags rows whose (integer-scaled) value exceeds ``num/den`` times the
row's GROUP mean — the broadcast-aggregate + streaming-filter pattern:
one tiny hash ``groupby`` produces per-group ``(sum, count)`` exactly
(int64 sums are associative, order-independent), the per-group cut
``q = (num * sum) // (den * n)`` is computed on the driver in
arbitrary-precision Python ints (no overflow at any scale: the
group count never rides inside a fixed-width multiply), and the flag
is the exact integer comparison ``v > q`` — bit-reproducible across
block layouts, CPU counts and SQL engines, because for integers
``v * den * n > num * sum  ⟺  v > (num * sum) // (den * n)``
(``//`` = Python FLOOR division; the equivalence holds for any sign of
``sum`` as long as ``den * n > 0``).  SQL oracles must therefore
compare with the multiplication form ``v * den * n > num * sum``
directly — SQL ``//`` truncates toward zero and disagrees with the
floor cut when the group sum is negative.

The value stream is scaled ``floor(value * scale)`` — FLOOR (not
ROUND) so numpy and ANSI SQL agree at every representable double.

Scale: the aggregate is ``n_groups`` rows (broadcast as a plain dict
via the map_batches closure / ray.put under the hood); the fact stream
is filtered in place, no shuffle.  RAQC analog: SURVEY §2.9 F2/F3
(percentile outliers) — this is the exact-arithmetic mean-multiple
variant a data-quality pipeline uses when thresholds must be
reproducible across engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def grouped_mean_outliers(ds, key: str, value_col: str,
                          scale: int = 1_000_000,
                          num: int = 2, den: int = 1,
                          keep_cols: list[str] | None = None):
    """Rows where ``floor(value*scale) > (num/den) * group mean`` (in
    exact integer arithmetic).  Output: ``keep_cols`` + ``key`` +
    ``vi`` (the scaled int64 value).  ``num``/``den`` must be positive
    ints; groups absent from the aggregate cannot occur (every row
    contributes to its own group)."""
    from ray.data.aggregate import Count, Sum

    keep_cols = keep_cols or []

    def scaled(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keep_cols + [key]].copy()
        out["vi"] = np.floor(
            df[value_col].to_numpy(dtype=np.float64) * scale
        ).astype(np.int64)
        return out

    # materialize: the aggregate and the flag pass are two executions
    # of the same lineage — pin it so an expensive/non-reproducible
    # upstream runs once and both passes see identical rows
    vi_ds = ds.map_batches(scaled, batch_format="pandas").materialize()
    agg = (vi_ds.groupby(key)
           .aggregate(Sum("vi", alias_name="sv"),
                      Count(alias_name="n"))
           .to_pandas())
    # exact per-group cut in Python ints; v > q ⟺ v*den*n > num*sv
    cuts = {k: (num * int(sv)) // (den * int(n))
            for k, sv, n in zip(agg[key], agg["sv"], agg["n"])}

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        q = df[key].map(cuts).to_numpy(dtype=np.int64)
        return df[df["vi"].to_numpy() > q]

    return vi_ds.map_batches(flag, batch_format="pandas")
