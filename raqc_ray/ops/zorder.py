"""Z-order (Morton curve) multi-dimensional clustering — the layout
primitive behind data-skipping scans at 100-TB scale: rows sorted by
the bit-interleave of two key columns land in shards whose per-shard
min/max envelopes are TIGHT in BOTH dimensions, so a predicate on
either column prunes most shards at the read (the reason engines
like Delta/Iceberg expose Z-ORDER BY).

The op is pure integer arithmetic end-to-end:

1. ``z = interleave16(x & 0xFFFF, y & 0xFFFF)`` — the classic
   mask-and-shift bit spread (Morton 1966), fully vectorized in
   int64 numpy; the low 16 bits of each dimension participate
   (callers with wider domains pre-rank or pre-scale — documented,
   same contract as any fixed-width curve);
2. shard id = ``z >> (32 - 2*level)`` — the top ``2*level`` bits of
   the curve, i.e. the quadtree cell at depth ``level``;
3. ONE hash ``groupby(shard)`` over per-block partials emits the
   shard manifest ``(shard, n_rows, min/max of both dims)`` — the
   exact pruning envelope a reader would consult.  Nothing
   row-sized shuffles: blocks collapse to (blocks x shards) partial
   rows first.

The same mask-and-shift expression is valid DuckDB SQL (``&``,
``|``, ``<<``), so the oracle replays the interleave bit-for-bit —
no float anywhere.

RAQC analog: none — SURVEY §2 scale surface (the write-side
complement of S1's pruned-column reads; `raqc_ray/partitions.py`
aligns existing shards, this op DESIGNS them).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["interleave16", "zorder_shard_stats"]

_M1 = 0x0000FFFF0000FFFF
_M2 = 0x00FF00FF00FF00FF
_M3 = 0x0F0F0F0F0F0F0F0F
_M4 = 0x3333333333333333
_M5 = 0x5555555555555555


def _spread16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each int64 so bit i lands at 2i."""
    v = v & np.int64(0xFFFF)
    v = (v | (v << 8)) & np.int64(_M2)
    v = (v | (v << 4)) & np.int64(_M3)
    v = (v | (v << 2)) & np.int64(_M4)
    v = (v | (v << 1)) & np.int64(_M5)
    return v


def interleave16(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Morton code of two int arrays' low 16 bits (x gets the
    even bit positions, y the odd)."""
    return _spread16(x.astype(np.int64)) \
        | (_spread16(y.astype(np.int64)) << 1)


def zorder_shard_stats(ds, x_col: str, y_col: str, level: int = 4):
    """Dataset ``(shard, n_rows, min_x, max_x, min_y, max_y)`` — the
    shard manifest of a Z-order layout at quadtree depth ``level``
    (``4**level`` possible shards).  All int64; inputs are taken
    ``& 0xFFFF`` (pre-rank wider domains).  The manifest is exactly
    what a pruning reader consults, so tight envelopes == good
    layout."""
    if not (1 <= level <= 16):
        raise ValueError("zorder_shard_stats: need 1 <= level <= 16")
    from ray.data.aggregate import Max, Min, Sum

    shift = np.int64(32 - 2 * level)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(dtype=np.int64) & np.int64(0xFFFF)
        y = df[y_col].to_numpy(dtype=np.int64) & np.int64(0xFFFF)
        z = interleave16(x, y)
        d = pd.DataFrame({"shard": z >> shift, "__x": x, "__y": y})
        g = d.groupby("shard", sort=False)
        out = g.agg(n_rows=("__x", "size"),
                    min_x=("__x", "min"), max_x=("__x", "max"),
                    min_y=("__y", "min"), max_y=("__y", "max"))
        return out.reset_index().astype("int64")

    return (ds.map_batches(partials, batch_format="pandas")
            .groupby("shard")
            .aggregate(Sum("n_rows", alias_name="n_rows"),
                       Min("min_x", alias_name="min_x"),
                       Max("max_x", alias_name="max_x"),
                       Min("min_y", alias_name="min_y"),
                       Max("max_y", alias_name="max_y")))
