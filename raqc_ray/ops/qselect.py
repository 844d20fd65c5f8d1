"""Exact grouped quantile by DISTRIBUTED SELECTION (parallel binary
search) — the third point in the exact-quantile design space:

- ``ops/quantile_exact`` shuffles a (key x distinct values) histogram:
  right when values are quantized (distinct counts << rows);
- ``sketches/tdigest`` is approximate: right when error bounds are
  acceptable;
- THIS op is exact with O(keys) memory and ZERO value shuffle: right
  when the value domain is continuous/high-cardinality (the histogram
  explodes) but exactness is required.

Classic distributed selection (the median-finding folklore of
Blum et al.'s selection lowered onto MapReduce): every group binary-
searches its integer cents domain SIMULTANEOUSLY — one streaming
count pass per bit of domain width, each pass a per-block vectorized
``count(v <= mid[key])`` partial + one aggregate-sized groupby.  The
driver holds only (lo, hi, target) per key — aggregate-scale state,
the same budget as any broadcast LUT — and the input materializes
ONCE so the ~log2(domain) passes rescan pinned blocks, not lineage.

Rank rule: smallest value whose cumulative count reaches
``max(1, ceil(q*n))`` — identical to `ops/quantile_exact` and
DuckDB's ``quantile_disc`` (the shared oracle).

Cost shape at 10^12 rows: ~32-40 full scans.  That is the honest
price of exactness without a histogram; use it when a quantile is a
GATE (a compliance threshold, a payout cut) and the domain is too
wide to count.  For routine monitoring use the t-digest.

RAQC analog: SURVEY §2.5 A2/A3 (percentile verdicts) — the exact
wide-domain path those t-digest verdicts cannot provide.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

__all__ = ["grouped_quantile_select"]


def grouped_quantile_select(ds, key: str, value_col: str,
                            q: float = 0.5, scale: int = 100,
                            out_col: str = "qv"):
    """Dataset-shaped pandas result ``(key, n, out_col)`` — one row
    per key; ``out_col`` is the exact discrete q-quantile of the
    cents-quantized ``value_col``.  Returns a small in-memory frame
    (one row per key — aggregate-sized by construction)."""
    if not (0.0 < q <= 1.0):
        raise ValueError("grouped_quantile_select: need 0 < q <= 1")
    import ray
    from ray.data.aggregate import Count, Max, Min, Sum

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: df[key],
            "__vi": np.floor(
                df[value_col].to_numpy(dtype=np.float64) * scale + 0.5
            ).astype(np.int64),
        })

    vds = ds.map_batches(prep, batch_format="pandas").materialize()
    agg = (vds.groupby(key)
           .aggregate(Min("__vi", alias_name="lo"),
                      Max("__vi", alias_name="hi"),
                      Count(alias_name="n"))
           .to_pandas())
    lo = {k: int(v) for k, v in zip(agg[key], agg["lo"])}
    hi = {k: int(v) for k, v in zip(agg[key], agg["hi"])}
    n = {k: int(v) for k, v in zip(agg[key], agg["n"])}
    target = {k: max(1, math.ceil(q * n[k])) for k in n}

    while True:
        open_keys = {k: (lo[k] + hi[k]) // 2
                     for k in lo if lo[k] < hi[k]}
        if not open_keys:
            break
        mids_ref = ray.put(open_keys)

        def count_le(df: pd.DataFrame, *, _ref=mids_ref) -> pd.DataFrame:
            mids = ray.get(_ref)
            mid = df[key].map(mids)
            m = mid.notna()
            if not m.any():
                return pd.DataFrame({key: [], "__c": []})
            d = df[m]
            c = (d["__vi"].to_numpy(dtype=np.int64)
                 <= mid[m].to_numpy(dtype=np.int64))
            out = pd.DataFrame({key: d[key].to_numpy(),
                                "__c": c.astype(np.int64)})
            return (out.groupby(key, sort=False, as_index=False)
                    .sum())

        counts = (vds.map_batches(count_le, batch_format="pandas")
                  .groupby(key).aggregate(Sum("__c", alias_name="__c"))
                  .to_pandas())
        got = {k: int(v) for k, v in zip(counts[key], counts["__c"])}
        for k, mid in open_keys.items():
            if got.get(k, 0) >= target[k]:
                hi[k] = mid
            else:
                lo[k] = mid + 1

    return pd.DataFrame({key: list(lo.keys()),
                         "n": np.array([n[k] for k in lo],
                                       dtype=np.int64),
                         out_col: np.array([lo[k] for k in lo],
                                           dtype=np.int64)})
