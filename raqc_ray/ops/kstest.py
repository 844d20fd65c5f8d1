"""Exact grouped two-sample Kolmogorov-Smirnov statistic — each key's
value distribution vs the REST of the data — in pure integer
arithmetic, so the result is bit-identical across block layouts and
matches a window-SQL oracle token-for-token.

The KS distance ``D = max_x |F_key(x) - F_rest(x)|`` is reported as the
integer numerator ``ks_num = max_x |c_key(x)*n_rest - c_rest(x)*n_key|``
(``D = ks_num / (n_key * n_rest)``), where ``c``/``n`` are cumulative /
total counts of the integer-scaled values.  Unlike the PSI/KS-on-fixed-
bins drift check (`raqc_ray/checks/drift.py` — streaming, sketch-sized,
for in-pipeline verdicts), this operator is EXACT over the full value
grid: the audit-grade statistic for "did event_type X's value
distribution drift away from everything else".

Scale plan (no data-sized driver state, one all-to-all):

1. per-block combiner: counts per ``(vi, key)`` pivoted WIDE — one row
   per distinct in-block ``vi`` with one int64 column per key (the key
   alphabet is tiny and discovered first; the value stream collapses to
   block-distinct grid rows before anything moves);
2. ONE hash groupby on ``vi`` sums the wide partials — the only
   exchange, distinct-value-grid-sized;
3. the cumulative scan is the carried-offset two-phase pattern
   (`ops/prefix.py`): bucket by a monotone affine map of ``vi``,
   per-bucket per-key totals (bucket x key — tiny) are exclusive-
   cumsummed on the driver into broadcast offsets, then ONE
   `scan_sorted_groups` pass computes global cumulatives inside each
   bucket and emits per-(bucket, key) PARTIAL MAXES of the statistic —
   a Max-reduce finishes.  Overflow guard: the products live in int64,
   which holds up to n_key*n_rest < 2^63 (raise beyond — at that
   magnitude rescale values or sample; the SQL oracle uses HUGEINT).

RAQC analog: drift F1 (SURVEY §2.9) is the sketch path; this is the
exact-audit complement on the §2 training-data surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["grouped_ks_vs_rest"]


def grouped_ks_vs_rest(ds, key: str, value_col: str, scale: int = 100):
    """Dataset ``(key, n_key, n_rest, ks_num)`` — one int64 row per key
    value; ``ks_num / (n_key*n_rest)`` is the exact two-sample KS
    distance between the key's ``floor(value*scale)`` distribution and
    the pooled rest.  Null keys/values are dropped."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from .groupscan import scan_sorted_groups

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[key, value_col])
        return pd.DataFrame({
            key: d[key].astype(str),
            "vi": np.floor(
                d[value_col].to_numpy(dtype=np.float64) * scale
            ).astype(np.int64),
        })

    # materialize: the key-alphabet probe and the grid build are two
    # executions of the same lineage (grouped_share discipline)
    vi_ds = ds.map_batches(prep, batch_format="pandas").materialize()
    from ray.data.aggregate import Count

    keys_df = (vi_ds.groupby(key).aggregate(Count(alias_name="n"))
               .to_pandas().sort_values(key).reset_index(drop=True))
    out_empty = pd.DataFrame({key: pd.Series(dtype="object"),
                              "n_key": pd.Series(dtype="int64"),
                              "n_rest": pd.Series(dtype="int64"),
                              "ks_num": pd.Series(dtype="int64")})
    if len(keys_df) == 0:
        return rd.from_pandas(out_empty)
    klist = keys_df[key].tolist()
    n_by_key = keys_df["n"].to_numpy(dtype=np.int64)
    n_all = int(n_by_key.sum())
    if any(int(nk) * (n_all - int(nk)) >= 2 ** 63 for nk in n_by_key):
        raise ValueError(
            "grouped_ks_vs_rest: n_key*n_rest exceeds int64 — rescale "
            "or sample before the exact KS audit")
    cols = [f"c{i}" for i in range(len(klist))]
    kpos = {k: i for i, k in enumerate(klist)}

    def wide(df: pd.DataFrame) -> pd.DataFrame:
        ki = df[key].map(kpos).to_numpy(dtype=np.int64)
        vi = df["vi"].to_numpy(dtype=np.int64)
        grid, inv = np.unique(vi, return_inverse=True)
        mat = np.zeros((len(grid), len(klist)), dtype=np.int64)
        np.add.at(mat, (inv, ki), 1)
        out = pd.DataFrame({"vi": grid})
        for i, c in enumerate(cols):
            out[c] = mat[:, i]
        return out

    cnt = (vi_ds.map_batches(wide, batch_format="pandas")
           .groupby("vi")
           .aggregate(*[Sum(c, alias_name=c) for c in cols])
           .materialize())
    # ---- carried-offset cumulative scan (ops/prefix.py pattern) ----
    lo = int(cnt.min("vi"))
    hi = int(cnt.max("vi"))
    n_buckets = 64
    width = max(hi - lo, 0) + 1

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        v = df["vi"].to_numpy(dtype=np.int64)
        out = df.copy()
        out["__b"] = ((v - lo) * n_buckets) // width
        return out

    bds = cnt.map_batches(bucketize, batch_format="pandas")
    btot = (bds.groupby("__b")
            .aggregate(*[Sum(c, alias_name=c) for c in cols])
            .to_pandas().sort_values("__b").reset_index(drop=True))
    offs = np.zeros((n_buckets, len(cols)), dtype=np.int64)
    acc = np.zeros(len(cols), dtype=np.int64)
    for _, row in btot.iterrows():
        b = int(row["__b"])
        offs[b] = acc
        acc = acc + row[cols].to_numpy(dtype=np.int64)
    oref = ray.put(offs)
    nt = n_by_key
    nr = n_all - nt

    def bucket_stat(g: pd.DataFrame) -> pd.DataFrame:
        o = ray.get(oref)
        g = g.sort_values("vi")
        b = int(g["__b"].iloc[0])
        mat = g[cols].to_numpy(dtype=np.int64)
        ct = np.cumsum(mat, axis=0) + o[b][None, :]
        call = ct.sum(axis=1)  # cumulative over ALL keys at each vi...
        # ...only if every key's offset is included: offsets ARE the
        # full preceding mass per key, so call is the global all-cum
        stat = np.abs(ct * nr[None, :] - (call[:, None] - ct)
                      * nt[None, :])
        pmax = stat.max(axis=0)
        return pd.DataFrame({key: klist,
                             "ks_num": pmax.astype(np.int64)})

    empty = pd.DataFrame({key: pd.Series(dtype="object"),
                          "ks_num": pd.Series(dtype="int64")})
    partial = scan_sorted_groups(bds, "__b", bucket_stat, empty,
                                 min_group=1)
    final = (partial.groupby(key)
             .aggregate(Max("ks_num", alias_name="ks_num"))
             .to_pandas())
    out = keys_df.rename(columns={"n": "n_key"}).merge(final, on=key)
    out["n_rest"] = n_all - out["n_key"]
    for c in ("n_key", "n_rest", "ks_num"):
        out[c] = out[c].astype("int64")
    return rd.from_pandas(out[[key, "n_key", "n_rest", "ks_num"]])
