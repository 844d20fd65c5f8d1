"""Time-bucketed OHLC downsampling — per (key, bucket): open / high /
low / close / count / sum, the classic series-compaction aggregate.

Fully mergeable plan: each block reduces to ONE partial row per
(key, bucket) present in it, carrying ``(open_ts, open, close_ts,
close, lo, hi, n, sum)``; the global merge runs over PARTIAL rows
(keys×buckets × blocks, orders of magnitude below the input) through
one :func:`raqc_ray.ops.groupscan.scan_sorted_groups` pass with a
vectorized ``block_fn`` — no task-per-group ``map_groups``, no
whole-group materialization, per the repo's groupscan rationale.

Determinism: open/close pick by the total order ``(ts, tiebreak)``
(µs int64 + unique id), so ties cannot exist; min/max/sum/count are
order-insensitive.  Values are integers (cents) — bit-identical to
the ROW_NUMBER-window SQL oracle.

RAQC analog: SURVEY §2.8 W1 covers debounce windows; OHLC is the §2
training-data surface's series-downsampling op (metric compaction
before drift comparison).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .groupscan import scan_sorted_groups

_US_PER_HOUR = 3_600_000_000


def grouped_ohlc(ds, key: str, ts: str, value_col: str,
                 tiebreak: str, bucket_us: int = _US_PER_HOUR):
    """Dataset ``(key, bucket, open, high, low, close, n, vsum)``:
    one row per (key, bucket) where ``bucket`` is the integer
    ``floor(ts_µs / bucket_us)``; ``value_col`` must be int64."""

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        tie = df[tiebreak].to_numpy(dtype=np.int64)
        d = pd.DataFrame({
            key: df[key].to_numpy(),
            "bucket": t // bucket_us,
            "__ot": t, "__otie": tie,
            "__ct": t, "__ctie": tie,
            "__open": df[value_col].to_numpy(dtype=np.int64),
        })
        d["__close"] = d["__open"]
        d["__lo"] = d["__open"]
        d["__hi"] = d["__open"]
        d["__n"] = np.ones(len(d), dtype=np.int64)
        d["__sum"] = d["__open"]
        s = d.sort_values(["__ot", "__otie"], kind="mergesort")
        g = s.groupby([key, "bucket"], sort=False)
        out = g.agg(__ot=("__ot", "first"), __otie=("__otie", "first"),
                    __open=("__open", "first"),
                    __ct=("__ct", "last"), __ctie=("__ctie", "last"),
                    __close=("__close", "last"),
                    __lo=("__lo", "min"), __hi=("__hi", "max"),
                    __n=("__n", "sum"), __sum=("__sum", "sum"))
        return out.reset_index()

    part = ds.map_batches(partials, batch_format="pandas")
    keys = [key, "bucket"]

    def _finish(frame: pd.DataFrame, starts: np.ndarray,
                ends: np.ndarray, so: pd.DataFrame,
                sc: pd.DataFrame) -> pd.DataFrame:
        """Emit one row per segment given open-sorted / close-sorted
        views sharing the same segment offsets."""
        n = np.add.reduceat(so["__n"].to_numpy(dtype=np.int64), starts)
        vs = np.add.reduceat(so["__sum"].to_numpy(dtype=np.int64),
                             starts)
        lo = np.minimum.reduceat(so["__lo"].to_numpy(dtype=np.int64),
                                 starts)
        hi = np.maximum.reduceat(so["__hi"].to_numpy(dtype=np.int64),
                                 starts)
        return pd.DataFrame({
            key: so[key].to_numpy()[starts],
            "bucket": so["bucket"].to_numpy(dtype=np.int64)[starts],
            "open": so["__open"].to_numpy(dtype=np.int64)[starts],
            "high": hi, "low": lo,
            "close": sc["__close"].to_numpy(dtype=np.int64)[ends - 1],
            "n": n, "vsum": vs,
        })

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        so = g.sort_values(["__ot", "__otie"], kind="mergesort")
        sc = g.sort_values(["__ct", "__ctie"], kind="mergesort")
        z = np.array([0], dtype=np.int64)
        return _finish(g, z, np.array([len(g)], dtype=np.int64),
                       so.reset_index(drop=True),
                       sc.reset_index(drop=True))

    def block_fn(interior: pd.DataFrame, gs: np.ndarray,
                 ge: np.ndarray) -> pd.DataFrame:
        # two stable sorts give open-order and close-order views with
        # IDENTICAL segment offsets (primary keys lead both sorts)
        so = (interior.sort_values(keys + ["__ot", "__otie"],
                                   kind="mergesort")
              .reset_index(drop=True))
        sc = (interior.sort_values(keys + ["__ct", "__ctie"],
                                   kind="mergesort")
              .reset_index(drop=True))
        kb = so["bucket"].to_numpy(dtype=np.int64)
        kk = so[key].to_numpy()
        n = len(so)
        new = np.ones(n, dtype=bool)
        new[1:] = (kb[1:] != kb[:-1]) | (kk[1:] != kk[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        return _finish(so, starts, ends, so, sc)

    from ._join_util import arrow_schema

    # key dtype follows the input schema (string or integer keys)
    out_empty = (arrow_schema(part).empty_table().to_pandas()[[key]]
                 .copy())
    for c in ("bucket", "open", "high", "low", "close", "n", "vsum"):
        out_empty[c] = pd.Series(dtype="int64")
    return scan_sorted_groups(part, keys, group_fn, out_empty,
                              min_group=1, block_fn=block_fn)
