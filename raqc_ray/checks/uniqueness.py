"""Uniqueness check (SURVEY.md §2.5 A9) — key must be globally unique.

RAQC has no analog (grid position is inherently unique); mandated by the
target spec (BASELINE.json:6).  Scale shape, fully vectorized:

1. per-batch partial counts collapse each batch to one row per
   (key, partition) — the combiner, so what leaves each task is
   pre-aggregated, never the table;
2. totals per key via ``grouped_counts`` (driver-side pandas sum below a
   threshold — a distributed aggregate's fixed per-block scheduling
   dominates at partial-count sizes — with a width-bounded distributed
   fallback above it);
3. duplicated keys are by definition FEW (violations, not data): the
   violation rows are emitted directly from the filtered counts.

One violation row per (key, partition) occurrence pair keeps verdicts
partition-local.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ._util import empty_violations_df, grouped_counts


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
    import ray.data as rd

    partials = ds.map_batches(
        lambda b: _partial_counts(b, column, pid_fn), batch_format="pyarrow"
    )

    try:
        # single execution: (key, partition) partials collected once;
        # totals and dup rows both derive from the same frame
        pdf = partials.to_pandas(limit=2_000_000)
    except ValueError:
        pdf = None
    if pdf is not None:
        if len(pdf) == 0 or "key" not in pdf.columns:
            return rd.from_pandas(empty_violations_df())
        kp = pdf.groupby(["key", "partition_id"], sort=False)["n"].sum().reset_index()
        totals = kp.groupby("key", sort=False)["n"].sum()
        dup_lut = {k: int(v) for k, v in totals[totals > 1].items()}
        dup_rows = kp[kp["key"].isin(dup_lut)]
    else:
        partials = partials.materialize()
        totals_df = grouped_counts(partials, ["key"], min_total=2)
        if len(totals_df) == 0:
            return rd.from_pandas(empty_violations_df())
        dup_lut = dict(zip(totals_df["key"], totals_df["n"].astype(int)))

        def keep_dups(batch: pa.Table) -> pa.Table:
            import numpy as np

            keys = batch["key"].to_pylist()
            mask = np.fromiter((k in dup_lut for k in keys), dtype=bool,
                               count=len(keys))
            return batch.filter(pa.array(mask))

        dup_rows = grouped_counts(
            partials.map_batches(keep_dups, batch_format="pyarrow"),
            ["key", "partition_id"],
        )
    if len(dup_rows) == 0:
        return rd.from_pandas(empty_violations_df())
    out = pd.DataFrame(
        {
            "partition_id": dup_rows["partition_id"].astype("int64"),
            "epoch": epoch,
            "check": "uniqueness",
            "image_id": dup_rows["key"],
            "column": "image_id",
            "detail": [f"key occurs {dup_lut[k]} times" for k in dup_rows["key"]],
            "severity": severity,
        }
    ).sort_values(["image_id", "partition_id"])
    return rd.from_pandas(out.reset_index(drop=True))
