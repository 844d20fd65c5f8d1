"""Uniqueness check (SURVEY.md §2.5 A9) — key must be globally unique.

RAQC has no analog (grid position is inherently unique); mandated by the
target spec (BASELINE.json:6).  Scale shape, fully vectorized (no
Python-per-group anywhere):

1. per-batch partial counts collapse each batch to one row per
   (key, partition) — the combiner, so the shuffle moves pre-aggregated
   rows, not the table;
2. a native ``groupby(key).aggregate(Sum)`` (C-path) yields total counts;
3. duplicated keys are by definition FEW (violations, not data) — they are
   collected, broadcast via ``ray.put``, and the violation rows are emitted
   by a vectorized membership filter over the partials.

One violation row per (key, partition) occurrence pair keeps verdicts
partition-local.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Sum

from ._util import empty_violations_df


def _partial_counts(batch: pa.Table, column: str, pid_fn) -> pa.Table:
    pids = pid_fn(batch)
    keys = batch[column].cast(pa.string())
    df = pd.DataFrame({"key": keys.to_pandas(), "partition_id": pids})
    agg = df.groupby(["key", "partition_id"], sort=False).size().reset_index(name="n")
    return pa.table(
        {
            "key": pa.array(agg["key"], pa.string()),
            "partition_id": pa.array(agg["partition_id"], pa.int64()),
            "n": pa.array(agg["n"], pa.int64()),
        }
    )


def uniqueness_violations(ds, column: str, epoch: str, pid_fn, severity: str = "error"):
    """ds must already be projected to [column (+ path)] — prune at the read."""
    partials = ds.map_batches(
        lambda b: _partial_counts(b, column, pid_fn), batch_format="pyarrow"
    ).materialize()  # partials are (≈ distinct keys)-sized; reused twice below

    totals = partials.groupby("key").aggregate(Sum("n", alias_name="total"))
    dup_tbl = totals.filter(expr="total > 1").to_pandas()
    if len(dup_tbl) == 0 or "key" not in dup_tbl.columns:
        import ray.data as rd

        return rd.from_pandas(empty_violations_df())
    dup_lut = dict(zip(dup_tbl["key"], dup_tbl["total"].astype(int)))
    ref = ray.put(dup_lut)

    def keep_dups(batch: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        keys = batch["key"].to_pylist()
        mask = np.fromiter((k in lut for k in keys), dtype=bool, count=len(keys))
        return batch.filter(pa.array(mask))

    def emit(batch: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        if batch.num_rows == 0:
            return pa.Table.from_pandas(empty_violations_df(), preserve_index=False)
        keys = batch["key"].to_pylist()
        n = batch.num_rows
        return pa.table(
            {
                "partition_id": batch["partition_id"],
                "epoch": pa.array([epoch] * n, pa.string()),
                "check": pa.array(["uniqueness"] * n, pa.string()),
                "image_id": batch["key"].cast(pa.string()),
                "column": pa.array(["image_id"] * n, pa.string()),
                "detail": pa.array(
                    [f"key occurs {lut[k]} times" for k in keys], pa.string()
                ),
                "severity": pa.array([severity] * n, pa.string()),
            }
        )

    # filter partials down to duplicated keys FIRST (violation-sized), then
    # collapse per (key, partition) and emit — every step vectorized
    dup_partials = partials.map_batches(keep_dups, batch_format="pyarrow")
    dedup = dup_partials.groupby(["key", "partition_id"]).aggregate(
        Sum("n", alias_name="n")
    )
    return dedup.map_batches(emit, batch_format="pyarrow")
