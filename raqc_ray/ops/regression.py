"""Grouped multiple linear regression (two predictors) by exact
moment sums — the distributed model-fit primitive: ``y = b0 + b1·x1 +
b2·x2`` per key, one pass over the input, normal-equations solve on
keys-sized aggregates.

Plan: each block reduces to per-key INTEGER moment partials (n, Σx1,
Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y — 9 int64 sums, vectorized
pandas groupby), the keys × blocks partial stream is re-summed per
key by the sorted-block ``vhist.grouped_sums`` plan (Ray's native Sum
aggregate pays Python-level per-group cost — BASELINE.md round-5),
and a vectorized finish solves the centered 2×2 system per key with
Cramer's rule.  The float epilogue (CAST exact int sums to DOUBLE,
centered covariances, determinant, coefficients, R²) mirrors the SQL
oracle token-for-token, rounded ``round_to`` dp (q46 discipline).

int64 headroom: |Σ x1·y| ≤ max|x1|·max|y|·n_key — callers pass
measures scaled so that product stays under 2^62 (the shared
``vhist.assert_headroom`` guard fires loudly per block otherwise).

Degenerate keys (singular centered Gram matrix — constant or
collinear predictors) and keys with n < 3 are DROPPED, oracle-mirrored
by a HAVING on the same determinant expression.

RAQC analog: SURVEY §2.5 A6 covers corr/regr-slope (q46/q63); this is
the multi-predictor closure of that family (quality-score calibration,
drift attribution over two covariates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .vhist import assert_headroom, key_pandas_dtype


def grouped_ols2(ds, key: str, x1: str, x2: str, y: str,
                 round_to: int = 6):
    """One row per regressable key: ``(key, n, b0, b1, b2, r2)`` —
    exact-moment least squares of ``y`` on ``(1, x1, x2)``.  Inputs
    must be integer-valued (cents/counts); keys with ``n < 3`` or a
    singular centered system are dropped."""
    import ray.data as rd

    from .vhist import grouped_sums

    cols = ["n", "sx1", "sx2", "sy", "sx1x1", "sx1x2", "sx2x2",
            "sx1y", "sx2y"]

    def block_moments(df: pd.DataFrame) -> pd.DataFrame:
        a = df[x1].to_numpy(dtype=np.int64)
        b = df[x2].to_numpy(dtype=np.int64)
        c = df[y].to_numpy(dtype=np.int64)
        mx = max((int(np.abs(a).max()) if len(a) else 0),
                 (int(np.abs(b).max()) if len(b) else 0))
        my = max(mx, (int(np.abs(c).max()) if len(c) else 0))
        assert_headroom(mx * my if mx else 0, len(df), "grouped_ols2")
        d = pd.DataFrame({
            key: df[key],
            "n": np.ones(len(df), dtype=np.int64),
            "sx1": a, "sx2": b, "sy": c,
            "sx1x1": a * a, "sx1x2": a * b, "sx2x2": b * b,
            "sx1y": a * c, "sx2y": b * c,
        })
        return d.groupby(key, sort=False, as_index=False).sum()

    # per-key re-sum of the keys × blocks partial stream via the
    # sorted-block plan (Ray's native Sum aggregate pays Python-level
    # per-group cost — BASELINE.md round-5 measurement)
    agg = grouped_sums(
        ds.map_batches(block_moments, batch_format="pandas"), key, cols)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        keep = n >= 3
        df = df[keep]
        n = n[keep]
        sx1 = df["sx1"].to_numpy(dtype=np.float64)
        sx2 = df["sx2"].to_numpy(dtype=np.float64)
        sy = df["sy"].to_numpy(dtype=np.float64)
        # centered second moments (the oracle mirrors this exact shape)
        c11 = df["sx1x1"].to_numpy(np.float64) - sx1 * sx1 / n
        c12 = df["sx1x2"].to_numpy(np.float64) - sx1 * sx2 / n
        c22 = df["sx2x2"].to_numpy(np.float64) - sx2 * sx2 / n
        c1y = df["sx1y"].to_numpy(np.float64) - sx1 * sy / n
        c2y = df["sx2y"].to_numpy(np.float64) - sx2 * sy / n
        det = c11 * c22 - c12 * c12
        ok = det != 0.0
        det_s = np.where(ok, det, 1.0)
        b1 = (c1y * c22 - c2y * c12) / det_s
        b2 = (c2y * c11 - c1y * c12) / det_s
        b0 = (sy - b1 * sx1 - b2 * sx2) / n
        out = pd.DataFrame({
            key: df[key].to_numpy()[ok],
            "n": n[ok].astype(np.int64),
            "b0": np.round(b0[ok], round_to),
            "b1": np.round(b1[ok], round_to),
            "b2": np.round(b2[ok], round_to),
        })
        return out

    res = agg.map_batches(finish, batch_format="pandas")
    empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        "n": pd.Series(dtype="int64"),
        "b0": pd.Series(dtype="float64"),
        "b1": pd.Series(dtype="float64"),
        "b2": pd.Series(dtype="float64")})
    return res.union(rd.from_pandas(empty))
