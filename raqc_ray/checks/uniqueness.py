"""Uniqueness check (SURVEY.md §2.5 A9) — key must be globally unique.

RAQC has no analog (grid position is inherently unique); mandated by the
target spec (BASELINE.json:6).  Scale shape: a per-batch partial count
(combiner) collapses each batch to one row per (key, partition) BEFORE the
groupby, so the all-to-all shuffle moves pre-aggregated rows, not the
table.  One violation row is emitted per (key, partition) occurrence pair
of a duplicated key, so per-partition verdicts stay partition-local.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import empty_violations_df


def _partial_counts(batch: pa.Table, column: str, pid_fn) -> pa.Table:
    pids = pid_fn(batch)
    keys = batch[column].cast(pa.string()).to_pylist()
    df = pd.DataFrame({"key": keys, "partition_id": pids})
    agg = df.groupby(["key", "partition_id"], sort=False).size().reset_index(name="n")
    return pa.table(
        {
            "key": pa.array(agg["key"], pa.string()),
            "partition_id": pa.array(agg["partition_id"], pa.int64()),
            "n": pa.array(agg["n"], pa.int64()),
        }
    )


def _emit_group(g: pd.DataFrame, epoch: str, severity: str) -> pd.DataFrame:
    # one group = one key; partial counts summed per partition
    per_part = g.groupby("partition_id", sort=True)["n"].sum()
    total = int(per_part.sum())
    if total <= 1:
        return empty_violations_df()
    key = g["key"].iloc[0]
    rows = [
        {
            "partition_id": int(pid),
            "epoch": epoch,
            "check": "uniqueness",
            "image_id": key,
            "column": "image_id",
            "detail": f"key occurs {total} times across {len(per_part)} partitions",
            "severity": severity,
        }
        for pid in per_part.index
    ]
    return pd.DataFrame(rows)


def uniqueness_violations(ds, column: str, epoch: str, pid_fn, severity: str = "error"):
    """ds must already be projected to [column (+ path)] — prune at the read."""
    partials = ds.map_batches(
        lambda b: _partial_counts(b, column, pid_fn), batch_format="pyarrow"
    )
    viol = partials.groupby("key").map_groups(
        lambda g: _emit_group(g, epoch, severity), batch_format="pandas"
    )
    return viol
