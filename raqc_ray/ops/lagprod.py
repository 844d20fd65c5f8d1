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


def grouped_lag_products_multi(ds, key: str, order_by: str,
                               id_col: str, value_col: str,
                               lags=(1, 2, 3), scale: int = 100):
    """Multi-lag generalization of :func:`grouped_lag_products` — the
    exact integer numerators of the per-key AUTOCORRELATION FUNCTION:
    one row per (key, lag) with ``n_pairs`` and ``s_lag = Σ_t v_t ·
    v_{t−lag}`` over the ``(order_by, id_col)``-sorted cents sequence,
    for every requested lag.  Keys with fewer than ``lag+1`` rows emit
    no row for that lag (mirroring the LAG(…, k) IS NOT NULL oracle).
    Combined with the grouped moments this yields r_k for k = 1..K —
    the periodicity / seasonality screen lag-1 alone cannot see.

    Same ONE-sort sorted-block plan; the per-block pass computes every
    lag with one shifted-product + masked ``add.reduceat`` per lag —
    vectorized over all keys at once, no per-group Python."""
    from ._join_util import arrow_schema
    from .groupscan import scan_sorted_groups

    lags = sorted(set(int(x) for x in lags))
    if not lags or lags[0] < 1:
        raise ValueError(f"lags must be positive ints, got {lags}")

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

    def _emit(kvals: np.ndarray, starts: np.ndarray,
              sizes: np.ndarray, v: np.ndarray,
              kk: np.ndarray) -> pd.DataFrame:
        outs = []
        nrows = len(v)
        for lag in lags:
            if nrows <= lag:
                continue
            prod = v[lag:] * v[:-lag]
            same = kk[lag:] == kk[:-lag]   # key-sorted => same segment
            prod = np.where(same, prod, 0)
            cnt = same.astype(np.int64)
            # owner segment of product i is the segment of row i
            s_lag = np.add.reduceat(prod, np.minimum(starts, nrows - lag - 1))
            n_pairs = np.add.reduceat(cnt, np.minimum(starts, nrows - lag - 1))
            # reduceat with clamped duplicate indices double-counts;
            # only keep segments whose start is a valid product index
            valid = starts <= nrows - lag - 1
            keep = n_pairs[valid] > 0
            outs.append(pd.DataFrame({
                key: kvals[valid][keep],
                "lag": np.full(int(keep.sum()), lag, dtype=np.int64),
                "n_pairs": n_pairs[valid][keep],
                "s_lag": s_lag[valid][keep],
            }))
        if not outs:
            return pd.DataFrame({key: kvals[:0], "lag": np.array([], np.int64),
                                 "n_pairs": np.array([], np.int64),
                                 "s_lag": np.array([], np.int64)})
        return pd.concat(outs, ignore_index=True)

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([order_by, id_col], kind="mergesort")
        v = s["__vi"].to_numpy(dtype=np.int64)
        kk = np.zeros(len(v), dtype=np.int64)
        return _emit(np.array([g[key].iloc[0]]),
                     np.array([0], dtype=np.int64),
                     np.array([len(v)], dtype=np.int64), v, kk)

    def block_fn(interior: pd.DataFrame, gs: np.ndarray,
                 ge: np.ndarray) -> pd.DataFrame:
        s = (interior.sort_values([key, order_by, id_col],
                                  kind="mergesort")
             .reset_index(drop=True))
        kk = s[key].to_numpy()
        v = s["__vi"].to_numpy(dtype=np.int64)
        nrows = len(s)
        new = np.ones(nrows, dtype=bool)
        new[1:] = kk[1:] != kk[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, nrows)).astype(np.int64)
        kcode = np.cumsum(new) - 1
        return _emit(kk[starts], starts, sizes, v, kcode)

    import pyarrow as pa

    key_dtype = (pa.schema([arrow_schema(pds).field(key)])
                 .empty_table().to_pandas()[key].dtype)
    out_empty = pd.DataFrame({key: pd.Series(dtype=key_dtype),
                              "lag": pd.Series(dtype="int64"),
                              "n_pairs": pd.Series(dtype="int64"),
                              "s_lag": pd.Series(dtype="int64")})
    return scan_sorted_groups(pds, key, group_fn, out_empty,
                              min_group=1, block_fn=block_fn)


def grouped_abs_jump_stats(ds, key: str, order_by: str, id_col: str,
                           value_col: str, scale: int = 100):
    """Per-key successive-difference VOLATILITY census: one row per
    key with ≥ 2 rows — ``(key, n_pairs, sum_abs_jump,
    max_abs_jump)`` over ``|v_t − v_{t−1}|`` in the ``(order_by,
    id_col)`` order, exact int64 cents (the mean absolute successive
    difference / Allan-style jitter screen: a re-ordered or replayed
    stream and a smooth metric have the same marginal distribution
    but very different jump sums).  Complements
    :func:`grouped_lag_products` (signed raw moment) with the robust
    L1 form.

    Same ONE-sort sorted-block plan and partitioning contract as the
    rest of the window family."""
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
    out_empty = pd.DataFrame({
        key: pd.Series(dtype="int64"),
        "n_pairs": pd.Series(dtype="int64"),
        "sum_abs_jump": pd.Series(dtype="int64"),
        "max_abs_jump": pd.Series(dtype="int64"),
    })

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([order_by, id_col], kind="mergesort")
        d = np.abs(np.diff(s["__vi"].to_numpy(dtype=np.int64)))
        if not len(d):
            return out_empty
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n_pairs": [np.int64(len(d))],
                             "sum_abs_jump": [np.int64(d.sum())],
                             "max_abs_jump": [np.int64(d.max())]})

    def block_fn(interior: pd.DataFrame, gs: np.ndarray,
                 ge: np.ndarray) -> pd.DataFrame:
        s = (interior.sort_values([key, order_by, id_col],
                                  kind="mergesort")
             .reset_index(drop=True))
        kk = s[key].to_numpy()
        v = s["__vi"].to_numpy(dtype=np.int64)
        n = len(s)
        d = np.abs(v[1:] - v[:-1])
        same = kk[1:] == kk[:-1]
        starts = np.concatenate([[0], np.flatnonzero(~same) + 1])
        sizes = np.diff(np.append(starts, n)).astype(np.int64)
        grp = np.concatenate([[0], np.cumsum(~same)])
        ngroups = len(starts)
        jsum = np.zeros(ngroups, dtype=np.int64)
        jmax = np.zeros(ngroups, dtype=np.int64)
        gd = d[same]
        if len(gd):
            gg = grp[:-1][same]
            seg = np.flatnonzero(
                np.concatenate([[True], gg[1:] != gg[:-1]]))
            owners = gg[seg]
            jsum[owners] = np.add.reduceat(gd, seg)
            jmax[owners] = np.maximum.reduceat(gd, seg)
        keep = sizes >= 2
        return pd.DataFrame({key: kk[starts][keep],
                             "n_pairs": (sizes - 1)[keep],
                             "sum_abs_jump": jsum[keep],
                             "max_abs_jump": jmax[keep]})

    return scan_sorted_groups(pds, key, group_fn, out_empty,
                              min_group=1, block_fn=block_fn)
