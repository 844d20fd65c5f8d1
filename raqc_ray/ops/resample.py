"""Per-key time-series resampling with forward fill — the gap-filling
primitive that turns an irregular event stream into a dense regular
series (metric compaction before drift / anomaly comparison).

For each key, emits one row per time bucket from the key's first to
its last observed bucket; a bucket's value is the last observation at
or before the bucket's end (carried forward through empty buckets).
"Last" is by the total order ``(ts, tiebreak)`` — deterministic under
timestamp ties.

Plan: ONE ``sort`` by key + one :func:`raqc_ray.ops.groupscan
.scan_sorted_groups` pass (``min_group=1``); per group the scan is
vectorized (stable sort, per-bucket last via run ends, dense-bucket
expansion via ``searchsorted`` forward fill).  Output size is
buckets × keys — the caller chooses ``bucket_us`` so that is the
compacted, not the exploded, regime.  Partitioning assumption: one
key's history fits a worker block (the :mod:`raqc_ray.ops.sessions`
contract).

SQL equivalent (the q134 oracle): bucket-last rows via ROW_NUMBER
DESC, validity intervals via LEAD, dense buckets via generate_series,
interval join — pure ANSI windows, no ASOF extension needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .groupscan import scan_sorted_groups


def resample_ffill(ds, key: str, ts: str, value_col: str,
                   tiebreak: str, bucket_us: int = 3_600_000_000):
    """Dataset ``(key, bucket, value)``: dense integer buckets
    ``floor(ts_µs / bucket_us)`` per key with forward-filled int64
    values."""
    from ._join_util import arrow_schema

    base = arrow_schema(ds).empty_table().to_pandas()[[key]].copy()
    out_empty = base
    out_empty["bucket"] = pd.Series(dtype="int64")
    out_empty["value"] = pd.Series(dtype="int64")

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([ts, tiebreak], kind="mergesort")
        t = s[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = s[value_col].to_numpy(dtype=np.int64)
        b = t // bucket_us
        # last observation per observed bucket = run end in the sorted
        # order (ties already resolved by the (ts, tie) sort)
        last = np.ones(len(b), dtype=bool)
        last[:-1] = b[1:] != b[:-1]
        ob = b[last]                      # observed buckets, ascending
        ov = v[last]                      # their closing values
        dense = np.arange(ob[0], ob[-1] + 1, dtype=np.int64)
        # forward fill: index of the latest observed bucket ≤ dense
        idx = np.searchsorted(ob, dense, side="right") - 1
        return pd.DataFrame({
            key: np.full(len(dense), g[key].iloc[0]),
            "bucket": dense,
            "value": ov[idx],
        })

    return scan_sorted_groups(ds, key, group_fn, out_empty,
                              min_group=1)
