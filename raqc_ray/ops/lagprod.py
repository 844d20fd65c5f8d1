"""Per-key LAG-1 product sum — the exact-integer raw moment behind
serial autocorrelation: ``s_lag = sum_t v_t * v_{t-1}`` over each
key's ``(order_by, id)``-sorted cents sequence, plus the adjacent
pair count.  Combined with the grouped moments family
(`ops/moments.py` sums/squares) this yields the lag-1 autocorrelation
coefficient without ever leaving int64 — the serial-dependence screen
for event streams (a bursty or machine-generated metric shows high
|r1|; an i.i.d. one does not).

Exact integer contract: cents quantization ``floor(v*scale + 0.5)``;
a product term is bounded by ``max|cents|^2`` and the per-key sum by
``n * max|cents|^2`` — documented int64 bound (at cents <= 10^6 a
key may hold ~9e6 rows; pick a smaller scale for hotter keys).

Vectorization: ONE sorted-block scan; inside a block the shifted
product of the whole (key, order, id)-sorted value array is computed
once and pair positions crossing a group boundary are masked out —
per-group sums then fall out of one ``np.add.at`` segment reduce.

Plan shape: ONE ``ds.sort(key)`` + sorted-block scan
(`ops/groupscan.scan_sorted_groups`), the shared window-family plan.

RAQC analog: none — SURVEY §2 training-data surface (the
sequential-dependence sibling of the EWMA control line q150 and the
Kendall trend test q155).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["grouped_lag_products"]


def grouped_lag_products(ds, key: str, order_by: str, id_col: str,
                         value_col: str, scale: int = 100):
    """Dataset ``(key, n_pairs, s_lag)`` — one int64 row per key with
    >= 2 rows: count of adjacent pairs and the exact sum of adjacent
    cents products in per-key ``(order_by, id_col)`` order.
    Null-free input contract (fixture guarantee shared with the
    window family)."""
    from ._join_util import arrow_schema
    from .groupscan import scan_sorted_groups

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: df[key],
            order_by: df[order_by],
            id_col: df[id_col],
            "__vi": np.floor(
                df[value_col].to_numpy(dtype=np.float64) * scale + 0.5
            ).astype(np.int64),
        })

    pds = ds.map_batches(prep, batch_format="pandas")

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.sort_values([order_by, id_col], kind="mergesort")
             .reset_index(drop=True))
        vi = s["__vi"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            key: [s[key].iloc[0]],
            "n_pairs": np.array([len(vi) - 1], dtype=np.int64),
            "s_lag": np.array([int((vi[1:] * vi[:-1]).sum())],
                              dtype=np.int64),
        })

    def block_fn(interior: pd.DataFrame, gs: np.ndarray,
                 ge: np.ndarray) -> pd.DataFrame:
        s = (interior.sort_values([key, order_by, id_col],
                                  kind="mergesort")
             .reset_index(drop=True))
        kk = s[key].to_numpy()
        n = len(s)
        newg = np.ones(n, dtype=bool)
        newg[1:] = kk[1:] != kk[:-1]
        grp = np.cumsum(newg) - 1
        n_groups = int(grp[-1]) + 1 if n else 0
        vi = s["__vi"].to_numpy(dtype=np.int64)
        # pair position t pairs rows (t-1, t); mask cross-group pairs
        prod = vi[1:] * vi[:-1]
        same = ~newg[1:]
        tgt = grp[1:][same]
        s_lag = np.zeros(n_groups, dtype=np.int64)
        np.add.at(s_lag, tgt, prod[same])
        n_pairs = np.bincount(tgt, minlength=n_groups)
        keep = n_pairs >= 1
        g_starts = np.flatnonzero(newg)
        return pd.DataFrame({
            key: kk[g_starts][keep],
            "n_pairs": n_pairs[keep].astype(np.int64),
            "s_lag": s_lag[keep],
        })

    out_empty = (arrow_schema(pds).empty_table().to_pandas()
                 [[key]].copy())
    out_empty["n_pairs"] = pd.Series(dtype="int64")
    out_empty["s_lag"] = pd.Series(dtype="int64")
    return scan_sorted_groups(pds, key, group_fn, out_empty,
                              min_group=2, block_fn=block_fn)
