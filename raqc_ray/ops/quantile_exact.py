"""Exact grouped quantile-family statistics via distributed value
counts — no per-group sort of the input, no group ever collected, and
(since round 5) ONE exchange with NO per-key task.

Ray-Data-first plan (the round-5 port of VERDICT r4 #1, template
``grouped_quantile_cont_num``): ``map_batches`` reduces each block to
``(key, value) → count`` partials (pandas groupby, vectorized), and the
partials feed :func:`raqc_ray.ops.groupscan.scan_sorted_groups`
DIRECTLY — one range-partitioning sort of the histogram-sized stream,
then a vectorized ``block_fn`` picks every key's quantiles in a single
numpy pass (in-segment value lexsort + global strictly-increasing count
cumsum + searchsorted on per-segment rank targets).  The old global
``groupby([key, value]).aggregate(Sum)`` hash exchange (keys ×
distinct-values output groups) plus ``groupby(key).map_groups`` (one
Python task per key) was measured >170× slower at 10M rows / 100k keys
(BASELINE.md).  Duplicate ``(key, value)`` partial rows from different
blocks need no pre-merge: the in-segment sort puts equal values
adjacent, so the count cumsum crosses every rank target at the same
value either way.

The exchange is (distinct values per key) × blocks — for quantized /
integer-like measures that is orders of magnitude below row count, the
regime where exactness at 10^12 rows is affordable.  For continuous
high-cardinality values use the t-digest path
(:mod:`raqc_ray.sketches.tdigest`) instead; this operator is the exact
complement, same split as HLL vs :mod:`raqc_ray.ops.distinct`.

RAQC analog: SURVEY §2.5 A2/A4 (band percentiles / medians) — those
use t-digest inside the validation pipeline; this is the exact path.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .vhist import assert_headroom, gather_segments, key_pandas_dtype


def _value_count_partials(ds, key: str, value_col: str):
    """Per-block ``(key, value) → __c`` combiner (the only pass over
    the input stream)."""

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, value_col]].copy()
        d["__c"] = np.ones(len(d), dtype=np.int64)
        return d.groupby([key, value_col], sort=False, as_index=False).sum()

    return ds.map_batches(block_counts, batch_format="pandas")


def _sorted_seg_arrays(df: pd.DataFrame, key: str, value_col: str,
                       starts: np.ndarray, ends: np.ndarray,
                       count_col: str = "__c", value_dtype=None):
    """Gather qualifying segments, value-sort within each, and return
    ``(kv_seg, v, c, segid, sizes, cum_excl, cumg, base, n)`` — the
    common prologue of every quantile-family ``block_fn``.  ``cumg`` is
    the global (strictly increasing) count cumsum, ``base`` its value
    just before each segment, ``n`` each segment's total count."""
    idx, segid, sizes, cum_excl = gather_segments(starts, ends)
    kv_seg = df[key].to_numpy()[starts]
    v = df[value_col].to_numpy()
    if value_dtype is not None:
        v = v.astype(value_dtype)
    v = v[idx]
    c = df[count_col].to_numpy(dtype=np.int64)[idx]
    order = np.lexsort((v, segid))
    v, c = v[order], c[order]
    cumg = np.cumsum(c)
    seg_end = cum_excl + sizes
    base = np.where(cum_excl > 0, cumg[cum_excl - 1], 0)
    n = (cumg[seg_end - 1] - base).astype(np.int64)
    return kv_seg, v, c, segid, sizes, cum_excl, cumg, base, n


def _scan(hist, ds, key: str, pick, out_empty: pd.DataFrame, block_fn):
    from .groupscan import scan_sorted_groups

    return scan_sorted_groups(hist, key, pick, out_empty, min_group=1,
                              block_fn=block_fn)


def grouped_quantile_disc(ds, key: str, value_col: str,
                          qs: tuple[float, ...] = (0.5,),
                          prefix: str = "q"):
    """Dataset with one row per key: ``(key, n, {prefix}{q}...)`` where
    each quantile column holds the exact discrete quantile of
    ``value_col`` (the smallest value whose cumulative count reaches
    ``ceil(q·n)`` — DuckDB's ``quantile_disc`` rule, verified
    empirically on edge sizes)."""
    qcols = [f"{prefix}{str(q).replace('.', '_')}" for q in qs]
    hist = _value_count_partials(ds, key, value_col)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(value_col, kind="mergesort")
        v = s[value_col].to_numpy()
        c = s["__c"].to_numpy(dtype=np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        row = {key: [g[key].iloc[0]], "n": [n]}
        for q, col in zip(qs, qcols):
            target = max(1, math.ceil(q * n))
            row[col] = [v[int(np.searchsorted(cum, target))]]
        return pd.DataFrame(row)

    def block_pick(df: pd.DataFrame, starts: np.ndarray,
                   ends: np.ndarray) -> pd.DataFrame:
        kv, v, c, segid, sizes, cum_excl, cumg, base, n = \
            _sorted_seg_arrays(df, key, value_col, starts, ends)
        row = {key: kv, "n": n}
        for q, col in zip(qs, qcols):
            target = np.maximum(
                np.int64(1), np.ceil(q * n).astype(np.int64))
            row[col] = v[np.searchsorted(cumg, base + target)]
        return pd.DataFrame(row)

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        "n": pd.Series(dtype="int64"),
        **{c: pd.Series(dtype=key_pandas_dtype(ds, value_col))
           for c in qcols}})
    return _scan(hist, ds, key, pick, out_empty, block_pick)


def grouped_median_mad(ds, key: str, value_col: str):
    """Exact grouped MEDIAN (``quantile_cont(0.5)`` interpolation) and
    MAD (median absolute deviation, same interpolation) — both derived
    from ONE distributed value-histogram pass: the deviation histogram
    is a per-key transform of the value histogram (|v − med| with the
    same counts), so the input stream is read exactly once and no group
    is ever collected.

    Interpolation is ``lo + (hi − lo)·0.5`` (the SQL quantile_cont
    formula); for integer-valued measures every intermediate is exactly
    representable, making the result bit-identical to the SQL oracle.
    Columns: ``(key, n, median, mad)``."""
    hist = _value_count_partials(ds, key, value_col)

    def _wmedian(v: np.ndarray, c: np.ndarray) -> float:
        # v sorted ascending, c positive int64 counts
        cum = np.cumsum(c)
        n = int(cum[-1])
        lo_rank = (n + 1) // 2          # 1-based lower middle
        hi_rank = n // 2 + 1            # 1-based upper middle
        lo = v[int(np.searchsorted(cum, lo_rank))]
        hi = v[int(np.searchsorted(cum, hi_rank))]
        return float(lo + (hi - lo) * 0.5)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(value_col, kind="mergesort")
        v = s[value_col].to_numpy(dtype=np.float64)
        c = s["__c"].to_numpy(dtype=np.int64)
        med = _wmedian(v, c)
        dv = np.abs(v - med)
        order = np.argsort(dv, kind="mergesort")
        mad = _wmedian(dv[order], c[order])
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n": [np.int64(c.sum())],
                             "median": [med], "mad": [mad]})

    def _wmedian_vec(v, c, segid, sizes, cum_excl):
        """Per-segment interpolated weighted median over already
        (segid, v)-sorted arrays — vectorized across ALL segments."""
        cumg = np.cumsum(c)
        seg_end = cum_excl + sizes
        base = np.where(cum_excl > 0, cumg[cum_excl - 1], 0)
        n = cumg[seg_end - 1] - base
        lo = v[np.searchsorted(cumg, base + (n + 1) // 2)]
        hi = v[np.searchsorted(cumg, base + n // 2 + 1)]
        return lo + (hi - lo) * 0.5, n.astype(np.int64)

    def block_pick(df: pd.DataFrame, starts: np.ndarray,
                   ends: np.ndarray) -> pd.DataFrame:
        idx, segid, sizes, cum_excl = gather_segments(starts, ends)
        kv = df[key].to_numpy()[starts]
        v = df[value_col].to_numpy(dtype=np.float64)[idx]
        c = df["__c"].to_numpy(dtype=np.int64)[idx]
        order = np.lexsort((v, segid))
        v, c = v[order], c[order]
        med, n = _wmedian_vec(v, c, segid, sizes, cum_excl)
        dv = np.abs(v - np.repeat(med, sizes))
        order2 = np.lexsort((dv, segid))
        mad, _ = _wmedian_vec(dv[order2], c[order2], segid, sizes,
                              cum_excl)
        return pd.DataFrame({key: kv, "n": n, "median": med,
                             "mad": mad})

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        "n": pd.Series(dtype="int64"),
        "median": pd.Series(dtype="float64"),
        "mad": pd.Series(dtype="float64")})
    return _scan(hist, ds, key, pick, out_empty, block_pick)


def grouped_quantile_cont(ds, key: str, value_col: str,
                          qs: tuple[float, ...] = (0.5,),
                          prefix: str = "q"):
    """Exact grouped CONTINUOUS quantiles (SQL ``quantile_cont``
    interpolation: position ``(n−1)·q`` over the sorted values,
    ``lo + (hi − lo)·frac``) — same distributed value-histogram plan as
    :func:`grouped_quantile_disc`: block-level (key, value) counts, ONE
    hash aggregation, then per-key interpolation over the histogram
    rows (distinct values per key, never input rows).  For
    integer-valued measures and dyadic ``q`` every intermediate is
    exactly representable, matching the SQL oracle bit-for-bit.

    Columns: ``(key, n, {prefix}{q}...)``."""
    qcols = [f"{prefix}{str(q).replace('.', '_')}" for q in qs]
    hist = _value_count_partials(ds, key, value_col)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(value_col, kind="mergesort")
        v = s[value_col].to_numpy(dtype=np.float64)
        cum = np.cumsum(s["__c"].to_numpy(dtype=np.int64))
        n = int(cum[-1])
        row = {key: [g[key].iloc[0]], "n": [np.int64(n)]}
        for q, col in zip(qs, qcols):
            pos = (n - 1) * q
            lo_i = int(math.floor(pos))
            hi_i = int(math.ceil(pos))
            # rank r (0-based) lives at the first distinct value whose
            # cumulative count exceeds r
            lo = v[int(np.searchsorted(cum, lo_i + 1))]
            hi = v[int(np.searchsorted(cum, hi_i + 1))]
            row[col] = [lo + (hi - lo) * (pos - lo_i)]
        return pd.DataFrame(row)

    def block_pick(df: pd.DataFrame, starts: np.ndarray,
                   ends: np.ndarray) -> pd.DataFrame:
        kv, v, c, segid, sizes, cum_excl, cumg, base, n = \
            _sorted_seg_arrays(df, key, value_col, starts, ends,
                               value_dtype=np.float64)
        row = {key: kv, "n": n}
        for q, col in zip(qs, qcols):
            pos = (n - 1) * q
            lo_i = np.floor(pos).astype(np.int64)
            hi_i = np.ceil(pos).astype(np.int64)
            lo = v[np.searchsorted(cumg, base + lo_i + 1)]
            hi = v[np.searchsorted(cumg, base + hi_i + 1)]
            row[col] = lo + (hi - lo) * (pos - lo_i)
        return pd.DataFrame(row)

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        "n": pd.Series(dtype="int64"),
        **{c: pd.Series(dtype="float64") for c in qcols}})
    return _scan(hist, ds, key, pick, out_empty, block_pick)


def grouped_percent_rank(ds, key: str, value_col: str,
                         scale: int = 10 ** 6):
    """Exact PERCENT_RANK per distinct value as a scaled integer:
    one output row per ``(key, value)`` with the value's multiplicity
    and ``pr = scale · (rank − 1) // (n − 1)`` where rank is the SQL
    RANK() of the value (1 + count of strictly smaller rows) — the
    distinct-value form of the window, derived from the same
    value-histogram plan as :func:`grouped_quantile_disc` (nothing
    row-scale shuffles; ties collapse into one carrier row).  Keys
    with a single row report ``pr = 0`` (the SQL convention).
    Columns: ``(key, value_col, cnt, pr)``.  Unlike the rank-crossing
    picks, the per-distinct-value emission REQUIRES globally-merged
    counts — duplicate partial rows are merged in-segment
    (``merge_runs``) instead of via a hash aggregate."""
    from .vhist import merge_runs, seg_bounds_of

    hist = _value_count_partials(ds, key, value_col)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        # boundary groups carry unmerged partials — merge first
        s = (g.groupby(value_col, as_index=False)["__c"].sum()
             .sort_values(value_col, kind="mergesort"))
        c = s["__c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        before = np.concatenate([[0], np.cumsum(c)[:-1]])
        pr = (before * scale // (n - 1) if n > 1
              else np.zeros(len(c), dtype=np.int64))
        return pd.DataFrame({key: np.repeat(g[key].iloc[0], len(c)),
                             value_col: s[value_col].to_numpy(),
                             "cnt": c, "pr": pr.astype(np.int64)})

    def block_pick(df: pd.DataFrame, starts: np.ndarray,
                   ends: np.ndarray) -> pd.DataFrame:
        idx, segid, sizes, cum_excl = gather_segments(starts, ends)
        kv_seg = df[key].to_numpy()[starts]
        v = df[value_col].to_numpy()[idx]
        c = df["__c"].to_numpy(dtype=np.int64)[idx]
        order = np.lexsort((v, segid))
        v, c, segid = v[order], c[order], segid
        _, seg_m, v_m, c_m = merge_runs(segid, v, c)
        sm_starts, sm_sizes = seg_bounds_of(seg_m, len(sizes))
        cumm = np.cumsum(c_m)
        base_m = np.where(sm_starts > 0, cumm[sm_starts - 1], 0)
        n = cumm[sm_starts + sm_sizes - 1] - base_m
        before = cumm - c_m - np.repeat(base_m, sm_sizes)
        n_rep = np.repeat(n, sm_sizes)
        pr = np.where(n_rep > 1,
                      before * scale // np.maximum(n_rep - 1, 1),
                      0)
        return pd.DataFrame({key: np.repeat(kv_seg, sm_sizes),
                             value_col: v_m, "cnt": c_m,
                             "pr": pr.astype(np.int64)})

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        value_col: pd.Series(dtype=key_pandas_dtype(ds, value_col)),
        "cnt": pd.Series(dtype="int64"),
        "pr": pd.Series(dtype="int64")})
    return _scan(hist, ds, key, rank, out_empty, block_pick)


def grouped_tail_sum(ds, key: str, value_col: str, q: float = 0.9):
    """Per-key tail mass above the exact discrete q-quantile: one row
    ``(key, n, cut, tail_n, tail_sum)`` where ``cut`` is the
    ``quantile_disc(q)`` value (smallest value whose cumulative count
    reaches ``ceil(q·n)``) and ``tail_n`` / ``tail_sum`` count and sum
    the values STRICTLY above it — the top-decile concentration audit
    (how much of the mass the heaviest items carry).  Same
    value-histogram + sorted-scan plan as
    :func:`grouped_quantile_disc`; the vectorized path accumulates
    ``Σ v·c`` in int64 behind an explicit headroom assertion
    (``max|v| · n < 2^62``; the boundary path stays Python-int
    exact)."""
    hist = _value_count_partials(ds, key, value_col)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(value_col, kind="mergesort")
        v = s[value_col].to_numpy()
        c = s["__c"].to_numpy(dtype=np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        cut_i = int(np.searchsorted(cum, max(1, math.ceil(q * n))))
        tail = v > v[cut_i]
        tail_sum = int((v[tail].astype(object) * c[tail]).sum()) \
            if tail.any() else 0
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n": [np.int64(n)],
                             "cut": [v[cut_i]],
                             "tail_n": [np.int64(c[tail].sum())],
                             "tail_sum": [np.int64(tail_sum)]})

    def block_pick(df: pd.DataFrame, starts: np.ndarray,
                   ends: np.ndarray) -> pd.DataFrame:
        kv, v, c, segid, sizes, cum_excl, cumg, base, n = \
            _sorted_seg_arrays(df, key, value_col, starts, ends,
                               value_dtype=np.int64)
        if len(v):
            assert_headroom(int(np.abs(v).max()), int(n.max()),
                            "grouped_tail_sum")
        cut_i = np.searchsorted(
            cumg, base + np.maximum(np.int64(1),
                                    np.ceil(q * n).astype(np.int64)))
        cut = v[cut_i]
        tail = v > np.repeat(cut, sizes)
        tail_n = np.add.reduceat(np.where(tail, c, 0), cum_excl)
        tail_sum = np.add.reduceat(np.where(tail, v * c, 0), cum_excl)
        return pd.DataFrame({key: kv, "n": n, "cut": cut,
                             "tail_n": tail_n.astype(np.int64),
                             "tail_sum": tail_sum.astype(np.int64)})

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        "n": pd.Series(dtype="int64"),
        "cut": pd.Series(dtype=key_pandas_dtype(ds, value_col)),
        "tail_n": pd.Series(dtype="int64"),
        "tail_sum": pd.Series(dtype="int64")})
    return _scan(hist, ds, key, pick, out_empty, block_pick)


def grouped_weighted_median(ds, key: str, value_col: str,
                            weight_col: str, out_col: str = "wmedian"):
    """Exact grouped WEIGHTED (lower) median: the smallest value whose
    cumulative weight reaches half the key's total weight —
    ``min v : 2·Σ_{x≤v} w(x) ≥ W``.  Weights must be non-negative
    int64, so every comparison is exact integer arithmetic and the
    result is layout-invariant (full SQL window oracle).

    Same plan as :func:`grouped_quantile_disc` with weight sums in
    place of counts: per-block ``(key, value) → Σw`` partials feed the
    sorted scan directly (duplicate partial rows tolerated — the
    weight cumsum crosses W/2 at the same value either way).
    Columns: ``(key, w_total, out_col)``."""

    def block_wsums(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, value_col]].copy()
        d["__w"] = df[weight_col].to_numpy(dtype=np.int64)
        return d.groupby([key, value_col], sort=False, as_index=False).sum()

    hist = ds.map_batches(block_wsums, batch_format="pandas")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(value_col, kind="mergesort")
        v = s[value_col].to_numpy()
        w = s["__w"].to_numpy(dtype=np.int64)
        cum = np.cumsum(w)
        total = int(cum[-1])
        idx = int(np.searchsorted(2 * cum, total))
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "w_total": [np.int64(total)],
                             out_col: [v[idx]]})

    def block_pick(df: pd.DataFrame, starts: np.ndarray,
                   ends: np.ndarray) -> pd.DataFrame:
        kv, v, w, segid, sizes, cum_excl, cumg, base, tot = \
            _sorted_seg_arrays(df, key, value_col, starts, ends,
                               count_col="__w")
        if len(w):
            assert_headroom(int(cumg[-1]), 2, "grouped_weighted_median")
        # first in-segment index where 2·(cum − base) ≥ total; clamp
        # to the segment start (an all-zero-weight segment would
        # otherwise resolve into the previous segment)
        idx = np.maximum(np.searchsorted(2 * cumg, 2 * base + tot),
                         cum_excl)
        return pd.DataFrame({key: kv, "w_total": tot,
                             out_col: v[idx]})

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        "w_total": pd.Series(dtype="int64"),
        out_col: pd.Series(dtype=key_pandas_dtype(ds, value_col))})
    return _scan(hist, ds, key, pick, out_empty, block_pick)


def grouped_weighted_quantile_cont(ds, key: str, value_col: str,
                                   weight_col: str,
                                   qs: tuple[float, ...] = (0.5,),
                                   prefix: str = "wq"):
    """Exact grouped WEIGHTED continuous quantiles: the
    ``quantile_cont`` interpolation over the weight-expanded multiset
    (each value counted ``weight`` times) — position ``(W−1)·q`` over
    the expansion, ``lo + (hi − lo)·frac`` — WITHOUT materializing the
    expansion anywhere.  The weight histogram plays the count
    histogram's role in :func:`grouped_quantile_cont`: per-block
    ``(key, value) → Σw`` partials feed the sorted scan, and the rank
    targets are found by searchsorted on the weight cumsum (duplicate
    partial rows tolerated — the cumsum crosses each rank at the same
    value either way).  Weights are positive int64; keys whose total
    weight is 0 are dropped.  The SQL oracle replays the expansion
    literally with ``generate_series(1, w)`` + ``percentile_cont``
    (fixture-scale weights), pinning the convention.

    Columns: ``(key, w_total, {prefix}{q}...)``."""
    qcols = [f"{prefix}{str(q).replace('.', '_')}" for q in qs]

    def block_wsums(df: pd.DataFrame) -> pd.DataFrame:
        w = df[weight_col].to_numpy(dtype=np.int64)
        m = w > 0
        d = pd.DataFrame({key: df[key].to_numpy()[m]})
        d[value_col] = df[value_col].to_numpy()[m]
        d["__w"] = w[m]
        return d.groupby([key, value_col], sort=False,
                         as_index=False).sum()

    hist = ds.map_batches(block_wsums, batch_format="pandas")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(value_col, kind="mergesort")
        v = s[value_col].to_numpy(dtype=np.float64)
        cum = np.cumsum(s["__w"].to_numpy(dtype=np.int64))
        n = int(cum[-1])
        row = {key: [g[key].iloc[0]], "w_total": [np.int64(n)]}
        for q, col in zip(qs, qcols):
            pos = (n - 1) * q
            lo_i = int(math.floor(pos))
            hi_i = int(math.ceil(pos))
            lo = v[int(np.searchsorted(cum, lo_i + 1))]
            hi = v[int(np.searchsorted(cum, hi_i + 1))]
            row[col] = [lo + (hi - lo) * (pos - lo_i)]
        return pd.DataFrame(row)

    def block_pick(df: pd.DataFrame, starts: np.ndarray,
                   ends: np.ndarray) -> pd.DataFrame:
        kv, v, w, segid, sizes, cum_excl, cumg, base, n = \
            _sorted_seg_arrays(df, key, value_col, starts, ends,
                               count_col="__w",
                               value_dtype=np.float64)
        row = {key: kv, "w_total": n}
        for q, col in zip(qs, qcols):
            pos = (n - 1) * q
            lo_i = np.floor(pos).astype(np.int64)
            hi_i = np.ceil(pos).astype(np.int64)
            lo = v[np.maximum(np.searchsorted(cumg, base + lo_i + 1),
                              cum_excl)]
            hi = v[np.maximum(np.searchsorted(cumg, base + hi_i + 1),
                              cum_excl)]
            row[col] = lo + (hi - lo) * (pos - lo_i)
        return pd.DataFrame(row)

    out_empty = pd.DataFrame({
        key: pd.Series(dtype=key_pandas_dtype(ds, key)),
        "w_total": pd.Series(dtype="int64"),
        **{c: pd.Series(dtype="float64") for c in qcols}})
    return _scan(hist, ds, key, pick, out_empty, block_pick)


def grouped_quantile_cont_num(ds, key: str, value_col: str,
                              ps=((25, 100), (90, 100)),
                              prefix: str = "p"):
    """Exact grouped ``percentile_cont`` as integer NUMERATORS — the
    continuous-interpolation quantile with no float anywhere, for
    integer-valued measures.

    ``percentile_cont(p)`` sits at continuous 0-based position
    ``(n-1)*p``; with ``p = pn/pden`` write ``(n-1)*pn = q*pden + r``,
    then::

        result = v[q] + (v[q+1] - v[q]) * r / pden
        num    = v[q]*pden + (v[q+1] - v[q])*r      (exact int64)

    so each output column holds ``num`` with the constant denominator
    ``pden`` — bit-identical across layouts and to the SQL
    list-indexing oracle.  ONE exchange, not two: per-block value
    counts (pandas groupby partials) feed ``scan_sorted_groups``
    DIRECTLY — no global ``groupby([key, value])`` hash aggregate.
    The pick tolerates duplicate ``(key, value)`` partial rows from
    different blocks because the in-segment value sort puts equal
    values adjacent and the count cumsum crosses rank targets at the
    same value either way; a hash aggregate with up to
    keys × distinct-values output groups (10^7+ when values are
    high-cardinality) was measured as the wall at 10M rows.  The
    per-key pick is a vectorized ``block_fn``: ALL keys of a sorted
    block in one numpy pass (lexsort within segments + global
    searchsorted on the strictly-increasing count cumsum) — no task
    and no per-key DataFrame, so 10^5+ keys cost what 10² do (the
    r3-verdict map_groups lesson applied at birth).

    Columns: ``(key, n, {prefix}{pn}_{pden}_num ...)``."""
    from ._join_util import arrow_schema
    from .groupscan import scan_sorted_groups

    cols = [f"{prefix}{pn}_{pden}_num" for pn, pden in ps]

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({key: df[key]})
        d[value_col] = df[value_col].to_numpy(dtype=np.int64)
        d["__c"] = np.ones(len(d), dtype=np.int64)
        return d.groupby([key, value_col], sort=False,
                         as_index=False).sum()

    hist = ds.map_batches(block_counts, batch_format="pandas")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(value_col, kind="mergesort")
        v = s[value_col].to_numpy(dtype=np.int64)
        c = s["__c"].to_numpy(dtype=np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        row = {key: [g[key].iloc[0]], "n": [np.int64(n)]}
        for (pn, pden), col in zip(ps, cols):
            q, r = divmod((n - 1) * pn, pden)
            lo = int(v[int(np.searchsorted(cum, q + 1))])
            hi = (int(v[int(np.searchsorted(cum, q + 2))])
                  if q + 2 <= n else lo)
            row[col] = [np.int64(lo * pden + (hi - lo) * r)]
        return pd.DataFrame(row)

    def block_pick(df: pd.DataFrame, starts: np.ndarray,
                   ends: np.ndarray) -> pd.DataFrame:
        # vectorized emission-equivalent of looping pick() over the
        # segments: min_group=1 means starts/ends tile the interior,
        # but gather by explicit index to stay correct regardless
        sizes = ends - starts
        total = int(sizes.sum())
        cum_excl = np.cumsum(sizes) - sizes
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(cum_excl, sizes) + np.repeat(starts, sizes))
        kv = df[key].to_numpy()[idx]
        v = df[value_col].to_numpy(dtype=np.int64)[idx]
        c = df["__c"].to_numpy(dtype=np.int64)[idx]
        segid = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        order = np.lexsort((v, segid))       # value-sorted within key
        v, c = v[order], c[order]
        cumg = np.cumsum(c)                  # strictly increasing: c >= 1
        seg_end = cum_excl + sizes
        base = np.where(cum_excl > 0, cumg[cum_excl - 1], 0)
        n = cumg[seg_end - 1] - base
        row = {key: kv[cum_excl], "n": n.astype(np.int64)}
        for (pn, pden), col in zip(ps, cols):
            q, r = np.divmod((n - 1) * pn, pden)
            lo = v[np.searchsorted(cumg, base + q + 1)]
            hi = np.where(q + 2 <= n,
                          v[np.searchsorted(cumg,
                                            np.minimum(base + q + 2,
                                                       cumg[-1]))],
                          lo)
            row[col] = (lo * pden + (hi - lo) * r).astype(np.int64)
        return pd.DataFrame(row)

    # key dtype from the INPUT schema (cheap; parquet metadata or an
    # already-materialized block) — asking the aggregated dataset for
    # its schema would execute the whole hash aggregate a second time
    import pyarrow as pa

    key_dtype = (pa.schema([arrow_schema(ds).field(key)])
                 .empty_table().to_pandas()[key].dtype)
    out_empty = pd.DataFrame({key: pd.Series(dtype=key_dtype),
                              "n": pd.Series(dtype="int64"),
                              **{c: pd.Series(dtype="int64")
                                 for c in cols}})
    return scan_sorted_groups(hist, key, pick, out_empty, min_group=1,
                              block_fn=block_pick)
def grouped_trimmed_mean(ds, key: str, value_col: str,
                         trim_pn: int = 1, trim_pd: int = 10,
                         scale: int = 10 ** 6):
    """Exact grouped TRIMMED mean: drop the lowest and highest
    ``floor(n·trim_pn/trim_pd)`` values by rank, then
    ``(key, n, trimmed_n, trimmed_sum, trimmed_mean_scaled)`` with
    ``trimmed_mean_scaled = scale·trimmed_sum // trimmed_n`` — pure
    int64 (the outlier-robust location estimate with a bit-stable
    oracle, unlike a float mean of floats).  Tie-invariant: the rank
    cut falls inside a run of equal values, so WHICH copies are
    dropped doesn't change the sum.  Keys whose keep window is empty
    (n ≤ 2·cut) emit nothing (oracle-mirrored by its HAVING).

    Same value-histogram + sorted-scan plan as
    :func:`grouped_weighted_median` (per-block partials feed the scan
    directly; duplicate partial rows are tolerated because the
    interval-clipped contribution is additive across consecutive
    sub-runs of the same value)."""
    from ._join_util import arrow_schema
    from .groupscan import scan_sorted_groups

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({key: df[key]})
        d[value_col] = df[value_col].to_numpy(dtype=np.int64)
        d["__c"] = np.ones(len(d), dtype=np.int64)
        return d.groupby([key, value_col], sort=False,
                         as_index=False).sum()

    hist = ds.map_batches(block_counts, batch_format="pandas")

    def _emit(kvals, n, tn, tsum) -> pd.DataFrame:
        n = np.asarray(n, dtype=np.int64)
        tn = np.asarray(tn, dtype=np.int64)
        tsum = np.asarray(tsum, dtype=np.int64)
        keep = tn > 0
        return pd.DataFrame({
            key: np.asarray(kvals)[keep], "n": n[keep],
            "trimmed_n": tn[keep], "trimmed_sum": tsum[keep],
            "trimmed_mean_scaled":
                (np.int64(scale) * tsum[keep]) // tn[keep],
        })

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(value_col, kind="mergesort")
        v = s[value_col].to_numpy(dtype=np.int64)
        c = s["__c"].to_numpy(dtype=np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        cut = (n * trim_pn) // trim_pd
        lo, hi = cut, n - cut           # keep ranks (lo, hi]
        p = cum - c                     # run-start cumulative counts
        kept = np.maximum(
            0, np.minimum(cum, hi) - np.maximum(p, lo))
        return _emit([g[key].iloc[0]], [n], [hi - lo],
                     [int((v * kept).sum())])

    def block_pick(df: pd.DataFrame, starts: np.ndarray,
                   ends: np.ndarray) -> pd.DataFrame:
        sizes = ends - starts
        total = int(sizes.sum())
        cum_excl = np.cumsum(sizes) - sizes
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(cum_excl, sizes) + np.repeat(starts, sizes))
        kv = df[key].to_numpy()[idx]
        v = df[value_col].to_numpy(dtype=np.int64)[idx]
        c = df["__c"].to_numpy(dtype=np.int64)[idx]
        segid = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        order = np.lexsort((v, segid))
        v, c = v[order], c[order]
        cumg = np.cumsum(c)
        seg_end = cum_excl + sizes
        base = np.where(cum_excl > 0, cumg[cum_excl - 1], 0)
        n = cumg[seg_end - 1] - base
        cut = (n * trim_pn) // trim_pd
        lo = np.repeat(base + cut, sizes)
        hi = np.repeat(base + n - cut, sizes)
        p = cumg - c
        kept = np.maximum(0, np.minimum(cumg, hi) - np.maximum(p, lo))
        tsum = np.add.reduceat(v * kept, cum_excl)
        return _emit(kv[cum_excl], n, n - 2 * cut, tsum)

    import pyarrow as pa

    key_dtype = (pa.schema([arrow_schema(ds).field(key)])
                 .empty_table().to_pandas()[key].dtype)
    out_empty = pd.DataFrame({key: pd.Series(dtype=key_dtype),
                              "n": pd.Series(dtype="int64"),
                              "trimmed_n": pd.Series(dtype="int64"),
                              "trimmed_sum": pd.Series(dtype="int64"),
                              "trimmed_mean_scaled":
                                  pd.Series(dtype="int64")})
    return scan_sorted_groups(hist, key, pick, out_empty, min_group=1,
                              block_fn=block_pick)
