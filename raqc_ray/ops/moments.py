"""Grouped second-moment aggregates — CORR / COVAR_SAMP / STDDEV_SAMP
as one distributed pass of raw-moment partials.

Ray-Data-first plan (the canonical pre-aggregate-then-shuffle shape):
``map_batches`` reduces each block to one row per key carrying the six
raw moments ``(n, Σx, Σy, Σx², Σy², Σxy)`` — a pandas groupby over the
block, fully vectorized — then ONE hash ``groupby(key).aggregate(Sum)``
moves keys × blocks rows (never the input), and a final tiny
``map_batches`` turns summed moments into the statistics.  All three
statistics come from the same six sums, so adding more outputs is free.

Numerical note: raw moments in float64 match DuckDB's streaming
kernels to ~1e-13 relative on TPC-H-scale magnitudes (verified against
``corr``/``covar_samp`` at sf0.01); outputs are rounded (``round_to``)
so the SQL oracle hashes bit-identically.  For ill-conditioned inputs
(mean ≫ stddev) switch the caller to per-block centered moments — the
combiner shape is unchanged.

RAQC analog: SURVEY §2.5 A6 column stats stop at min/max/mean; the
bivariate family is part of the §2 training-data-pipeline surface
(feature drift, label leakage screens).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def grouped_moments(ds, key: str, x: str, y: str, round_to: int = 6):
    """Dataset ``(key, n, corr, covar_samp, stddev_x, stddev_y)`` —
    sample statistics of ``x``/``y`` per ``key``."""
    from ray.data.aggregate import Sum

    def block_partials(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            key: df[key],
            "__n": np.ones(len(df), dtype=np.int64),
            "__sx": df[x].to_numpy(dtype=np.float64),
            "__sy": df[y].to_numpy(dtype=np.float64),
        })
        d["__sxx"] = d["__sx"] * d["__sx"]
        d["__syy"] = d["__sy"] * d["__sy"]
        d["__sxy"] = d["__sx"] * d["__sy"]
        return d.groupby(key, sort=False, as_index=False).sum()

    partial = ds.map_batches(block_partials, batch_format="pandas")
    summed = partial.groupby(key).aggregate(
        *[Sum(c, alias_name=c) for c in
          ("__n", "__sx", "__sy", "__sxx", "__syy", "__sxy")]
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["__n"].to_numpy(dtype=np.float64)
        sx, sy = df["__sx"].to_numpy(), df["__sy"].to_numpy()
        sxx, syy, sxy = (df["__sxx"].to_numpy(), df["__syy"].to_numpy(),
                         df["__sxy"].to_numpy())
        cov = (sxy - sx * sy / n) / (n - 1)
        vx = (sxx - sx * sx / n) / (n - 1)
        vy = (syy - sy * sy / n) / (n - 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = cov / np.sqrt(vx * vy)
        return pd.DataFrame({
            key: df[key],
            "n": df["__n"].astype("int64"),
            "corr": np.round(corr, round_to),
            "covar_samp": np.round(cov, round_to),
            "stddev_x": np.round(np.sqrt(vx), round_to),
            "stddev_y": np.round(np.sqrt(vy), round_to),
        })

    return summed.map_batches(finish, batch_format="pandas")


def grouped_linreg(ds, key: str, x: str, y: str, round_to: int = 6):
    """Grouped least-squares line — REGR_SLOPE / REGR_INTERCEPT /
    REGR_R2 of ``y`` on ``x`` per ``key``, from the SAME six raw-moment
    partials as :func:`grouped_moments` (one map_batches combiner + one
    tiny hash groupby; adding outputs over the sums is free).

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²), intercept = (Σy −
    slope·Σx)/n, r² = corr².  Same numerical contract as
    grouped_moments: raw float64 moments, outputs rounded to
    ``round_to`` so the SQL oracle hashes identically."""
    from ray.data.aggregate import Sum

    def block_partials(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            key: df[key],
            "__n": np.ones(len(df), dtype=np.int64),
            "__sx": df[x].to_numpy(dtype=np.float64),
            "__sy": df[y].to_numpy(dtype=np.float64),
        })
        d["__sxx"] = d["__sx"] * d["__sx"]
        d["__syy"] = d["__sy"] * d["__sy"]
        d["__sxy"] = d["__sx"] * d["__sy"]
        return d.groupby(key, sort=False, as_index=False).sum()

    partial = ds.map_batches(block_partials, batch_format="pandas")
    summed = partial.groupby(key).aggregate(
        *[Sum(c, alias_name=c) for c in
          ("__n", "__sx", "__sy", "__sxx", "__syy", "__sxy")]
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["__n"].to_numpy(dtype=np.float64)
        sx, sy = df["__sx"].to_numpy(), df["__sy"].to_numpy()
        sxx, syy, sxy = (df["__sxx"].to_numpy(), df["__syy"].to_numpy(),
                         df["__sxy"].to_numpy())
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            intercept = (sy - slope * sx) / n
            r2 = ((n * sxy - sx * sy) ** 2
                  / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
        return pd.DataFrame({
            key: df[key],
            "n": df["__n"].astype("int64"),
            "slope": np.round(slope, round_to),
            "intercept": np.round(intercept, round_to),
            "r2": np.round(r2, round_to),
        })

    return summed.map_batches(finish, batch_format="pandas")


def grouped_hist1d(ds, key: str, value_col: str, width: float):
    """Grouped equi-width 1-D histogram: ``(key, bucket, n)`` with
    ``bucket = floor(value / width)`` (int64) — the marginal of the
    engine's 2-D drift histogram (SURVEY §2.5 A1) as a standalone
    exact operator.  Per-block combiner counts (key, bucket) pairs;
    ONE hash groupby Sum moves buckets × blocks rows.  FLOOR of the
    same IEEE division on both engine and oracle ⇒ bit-identical
    bucket ids."""
    from ray.data.aggregate import Sum

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            key: df[key],
            "bucket": np.floor(
                df[value_col].to_numpy(dtype=np.float64) / width
            ).astype(np.int64),
        })
        d["n"] = np.ones(len(d), dtype=np.int64)
        return d.groupby([key, "bucket"], sort=False, as_index=False).sum()

    return (ds.map_batches(block_counts, batch_format="pandas")
            .groupby([key, "bucket"])
            .aggregate(Sum("n", alias_name="n")))


def grouped_share(ds, key: str, int_value_col: str,
                  out_col: str = "share", round_to: int = 9):
    """Per-row share of the group total — ``v / SUM(v) OVER
    (PARTITION BY key)`` — for an INTEGER value column, so the group
    totals are exact (associative int64 sums) and every share is the
    same IEEE division the SQL engine performs.  The totals table is
    keys-sized: broadcast into a streaming map (no second shuffle of
    the fact stream).  Appends ``out_col`` (float64, rounded).

    The input is materialized first: the aggregate and the map are two
    executions of the same lineage — without pinning, an expensive or
    non-reproducible upstream would run twice and could yield totals
    inconsistent with the rows being mapped."""
    from ray.data.aggregate import Sum

    ds = ds.materialize()
    totals = (ds.groupby(key)
              .aggregate(Sum(int_value_col, alias_name="__t"))
              .to_pandas())
    lut = dict(zip(totals[key], totals["__t"].astype("int64")))

    def add_share(df: pd.DataFrame) -> pd.DataFrame:
        t = df[key].map(lut).to_numpy(dtype=np.float64)
        v = df[int_value_col].to_numpy(dtype=np.float64)
        out = df.copy()
        out[out_col] = np.round(v / t, round_to)
        return out

    return ds.map_batches(add_share, batch_format="pandas")


def grouped_minmax_norm(ds, key: str, int_value_col: str,
                        out_col: str = "norm", round_to: int = 9):
    """Per-row min-max normalization within the row's group —
    ``(v − MIN(v) OVER key) / (MAX(v) − MIN(v) OVER key)`` — for an
    INTEGER value column (exact group extrema, one deterministic IEEE
    division; degenerate groups where max == min emit 0.0).  The
    feature-scaling stage of an ML data pipeline: one tiny Min/Max
    aggregate broadcast into a streaming map, no second shuffle.
    Appends ``out_col`` (float64, rounded).  Input materialized for the
    same two-execution consistency reason as :func:`grouped_share`."""
    from ray.data.aggregate import Max, Min

    ds = ds.materialize()
    ext = (ds.groupby(key)
           .aggregate(Min(int_value_col, alias_name="__lo"),
                      Max(int_value_col, alias_name="__hi"))
           .to_pandas())
    lo = dict(zip(ext[key], ext["__lo"].astype("int64")))
    hi = dict(zip(ext[key], ext["__hi"].astype("int64")))

    def add_norm(df: pd.DataFrame) -> pd.DataFrame:
        l = df[key].map(lo).to_numpy(dtype=np.float64)
        h = df[key].map(hi).to_numpy(dtype=np.float64)
        v = df[int_value_col].to_numpy(dtype=np.float64)
        span = h - l
        out = df.copy()
        with np.errstate(invalid="ignore", divide="ignore"):
            n = np.where(span > 0, (v - l) / span, 0.0)
        out[out_col] = np.round(n, round_to)
        return out

    return ds.map_batches(add_norm, batch_format="pandas")


def grouped_weighted_avg(ds, key: str, int_value_col: str,
                         int_weight_col: str, out_col: str = "wavg",
                         round_to: int = 6):
    """Exact grouped weighted average ``SUM(w·v)/SUM(w)`` over INTEGER
    value/weight columns (integer-cents discipline: both sums are
    associative int64, so the result is layout-invariant and the final
    division is the same single IEEE op the SQL engine performs).

    One block-combiner pass (per-block int64 sums) + ONE keys-sized
    hash aggregation; nothing row-sized shuffles.  Columns:
    ``(key, n, sum_w, {out_col})``.  Caveat shared with the other
    cents-discipline ops: ``Σ w·v`` must fit int64."""
    from ray.data.aggregate import Sum

    def block_partials(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            key: df[key],
            "__wv": df[int_value_col].to_numpy(dtype=np.int64)
            * df[int_weight_col].to_numpy(dtype=np.int64),
            "__w": df[int_weight_col].to_numpy(dtype=np.int64),
            "__n": np.ones(len(df), dtype=np.int64),
        })
        return d.groupby(key, sort=False, as_index=False).sum()

    agg = (ds.map_batches(block_partials, batch_format="pandas")
           .groupby(key)
           .aggregate(Sum("__wv", alias_name="__wv"),
                      Sum("__w", alias_name="__w"),
                      Sum("__n", alias_name="n")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        wv = df["__wv"].to_numpy(dtype=np.int64)
        w = df["__w"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            key: df[key],
            "n": df["n"].to_numpy(dtype=np.int64),
            "sum_w": w,
            out_col: np.round(wv.astype(np.float64) / w, round_to),
        })

    return agg.map_batches(finish, batch_format="pandas")


def grouped_zscore(ds, key: str, int_value_col: str, out_col: str = "z",
                   round_to: int = 6):
    """Appends ``out_col``: the per-key SAMPLE z-score of an
    integer-valued column — ``(v - mean) / stddev_samp`` — the
    standardization step of a feature pipeline (complement of
    :func:`grouped_minmax_norm`).

    Determinism discipline: the per-key moment sums ``(n, Σv, Σv²)``
    are EXACT int64 block partials merged by one keys-sized hash
    groupby (Ray sums int64 partials in arbitrary-precision Python
    ints, so the totals are exact under any layout); mean and stddev
    are then derived with ONE float64 rounding per term in the same
    order the SQL oracle does (``double(num) / double(den)``), so the
    per-row z matches the oracle bit-for-bit.  Requires every key to
    have n ≥ 2 rows (sample stddev) and a non-constant value stream.

    Input is materialized first (the grouped_share discipline): the
    keys-sized aggregate and the streaming map are two executions of
    the lineage.
    """
    from ray.data.aggregate import Sum

    ds = ds.materialize()

    def block_partials(df: pd.DataFrame) -> pd.DataFrame:
        v = df[int_value_col].to_numpy(dtype=np.int64)
        d = pd.DataFrame({key: df[key], "__n": np.ones(len(df),
                                                       dtype=np.int64),
                          "__s1": v, "__s2": v * v})
        return (d.groupby(key, sort=False, as_index=False).sum())

    agg = (ds.map_batches(block_partials, batch_format="pandas")
           .groupby(key)
           .aggregate(Sum("__n", alias_name="__n"),
                      Sum("__s1", alias_name="__s1"),
                      Sum("__s2", alias_name="__s2"))
           .to_pandas())
    stats: dict = {}
    for k, n, s1, s2 in zip(agg[key], agg["__n"], agg["__s1"],
                            agg["__s2"]):
        n, s1, s2 = int(n), int(s1), int(s2)
        mean = np.float64(s1) / np.float64(n)
        # sample variance from exact integer sums; one rounding per
        # operand, double division — the SQL oracle's exact shape
        var = (np.float64(n * s2 - s1 * s1)
               / np.float64(n * (n - 1)))
        stats[k] = (mean, np.sqrt(var))

    means = {k: v[0] for k, v in stats.items()}
    stds = {k: v[1] for k, v in stats.items()}

    def append_z(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        mean = df[key].map(means).to_numpy(dtype=np.float64)
        std = df[key].map(stds).to_numpy(dtype=np.float64)
        v = df[int_value_col].to_numpy(dtype=np.float64)
        out[out_col] = np.round((v - mean) / std, round_to)
        return out

    return ds.map_batches(append_z, batch_format="pandas")
