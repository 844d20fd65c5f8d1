"""Per-group winsorized mean — clip values at the group's interpolated
[q_lo, q_hi] quantiles, then take the exact mean of the clipped stream.

Ray-Data-first plan: the group clip bounds come from ONE distributed
value histogram (:func:`raqc_ray.ops.quantile_exact.
grouped_quantile_cont` — the fact stream never shuffles for them);
the keys-sized bounds table broadcasts into a streaming
``map_batches`` that clips and pre-aggregates each block to per-key
``(sum, n)`` partials, and one tiny ``groupby`` merges the partials.
Two passes over the fact stream total, zero fact-stream shuffles.

Determinism / oracle discipline: ``value_col`` must be quantized to
multiples of ``1/scale`` and the quantile fractions dyadic so the
interpolated bounds — and therefore every clipped value × ``scale`` —
are exactly representable integers.  The partial sums are then exact
int64 and the mean is the same single IEEE division the SQL engine
performs, making the result bit-identical to a
``quantile_cont`` + ``LEAST/GREATEST`` + ``AVG`` DuckDB oracle
regardless of block layout.

The input is materialized first: the bounds aggregate and the clip map
are two executions of the same lineage (ADVICE r3 — without pinning, an
expensive or non-reproducible upstream would run twice and could yield
bounds inconsistent with the rows being clipped).

RAQC analog: SURVEY §2.9 F2/F3 flag values outside percentile bounds;
this is the repair-side counterpart (clamp instead of flag) a
training-data pipeline uses for robust feature statistics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def winsorized_mean(ds, key: str, value_col: str,
                    q_lo: float = 0.25, q_hi: float = 0.75,
                    scale: int = 4, out_col: str = "wmean",
                    round_to: int = 6):
    """One row per key: ``(key, n, sum_scaled, out_col)`` where
    ``out_col`` is the mean of ``value_col`` clipped to the group's
    ``[quantile_cont(q_lo), quantile_cont(q_hi)]`` and ``sum_scaled``
    the exact int64 sum of ``clip(v) * scale``."""
    from ray.data.aggregate import Sum

    from .quantile_exact import grouped_quantile_cont

    ds = ds.materialize()
    qcols = [f"q{str(q).replace('.', '_')}" for q in (q_lo, q_hi)]
    bounds = grouped_quantile_cont(ds, key, value_col,
                                   qs=(q_lo, q_hi)).to_pandas()
    lo_lut = dict(zip(bounds[key], bounds[qcols[0]].astype(np.float64)))
    hi_lut = dict(zip(bounds[key], bounds[qcols[1]].astype(np.float64)))

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        lo = df[key].map(lo_lut).to_numpy(dtype=np.float64)
        hi = df[key].map(hi_lut).to_numpy(dtype=np.float64)
        # LEAST(GREATEST(v, lo), hi) — identical IEEE ops to the oracle;
        # the product is exactly integral by the quantization contract
        c = np.minimum(np.maximum(v, lo), hi) * scale
        d = pd.DataFrame({
            key: df[key],
            "sum_scaled": c.astype(np.int64),
            "n": np.ones(len(df), dtype=np.int64),
        })
        return d.groupby(key, sort=False, as_index=False).sum()

    agg = (ds.map_batches(partials, batch_format="pandas")
           .groupby(key)
           .aggregate(Sum("sum_scaled", alias_name="sum_scaled"),
                      Sum("n", alias_name="n"))
           .to_pandas())
    agg["sum_scaled"] = agg["sum_scaled"].astype("int64")
    agg["n"] = agg["n"].astype("int64")
    agg[out_col] = (agg["sum_scaled"] / (scale * agg["n"])).round(round_to)
    return agg[[key, "n", "sum_scaled", out_col]]
