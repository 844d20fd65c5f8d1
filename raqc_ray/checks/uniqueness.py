"""Uniqueness check (SURVEY.md §2.5 A9) — key must be globally unique.

RAQC has no analog (grid position is inherently unique); mandated by the
target spec (BASELINE.json:6).  Scale shape — two narrow passes, all
vectorized, driver work O(distinct keys) in *ints*, never strings:

1. pass 1 collapses each batch to (khash:int64, partition_id, n) partial
   counts (the combiner); the driver reduces them with numpy
   (sort + bincount) to find *candidate duplicate hashes* — collecting
   int64 hashes is ~10× cheaper than strings and the reduction is C-path;
2. pass 2 re-reads the narrow column, keeps only rows whose key hash is in
   the broadcast candidate set (vectorized searchsorted), and emits
   (key, partition, n) for EXACT verification on the driver — hash
   collisions only add candidate rows, never false violations.

Above ``driver_threshold`` materialized partial rows (automatic —
``decide_path``), step 1's candidate reduction switches from one Ray task
to a distributed ``groupby(khash).sum(n)`` + ``filter(n > 1)`` whose
*result* (candidate hashes = actual duplicates, violation-sized) is the
only thing collected; step 2 is identical on both paths, so violations
are byte-identical regardless of path.

One violation row per (key, partition) occurrence pair keeps verdicts
partition-local.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..sketches.hll import hash64
from ._util import empty_violations_df, violations_dataset


def _hash_partials(batch: pa.Table, column: str, pid_fn) -> pa.Table:
    pids = pid_fn(batch)
    kh = hash64(batch[column].cast(pa.string()).to_pylist()).view(np.int64)
    df = pd.DataFrame({"khash": kh, "partition_id": pids})
    agg = df.groupby(["khash", "partition_id"], sort=False).size().reset_index(
        name="n")
    return pa.table(
        {
            "khash": pa.array(agg["khash"], pa.int64()),
            "partition_id": pa.array(agg["partition_id"], pa.int64()),
            "n": pa.array(agg["n"], pa.int64()),
        }
    )


def _key_partials(batch: pa.Table, column: str, pid_fn, cand_ref) -> pa.Table:
    cand = ray.get(cand_ref)  # sorted int64 candidate hashes
    keys = batch[column].cast(pa.string())
    kh = hash64(keys.to_pylist()).view(np.int64)
    idx = np.clip(np.searchsorted(cand, kh), 0, len(cand) - 1)
    mask = cand[idx] == kh
    if not mask.any():
        return pa.table({"key": pa.array([], pa.string()),
                         "partition_id": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    pids = pid_fn(batch)[mask]
    sel_keys = keys.filter(pa.array(mask)).to_pandas()
    df = pd.DataFrame({"key": sel_keys, "partition_id": pids})
    agg = df.groupby(["key", "partition_id"], sort=False).size().reset_index(
        name="n")
    return pa.table(
        {
            "key": pa.array(agg["key"], pa.string()),
            "partition_id": pa.array(agg["partition_id"], pa.int64()),
            "n": pa.array(agg["n"], pa.int64()),
        }
    )


def uniqueness_violations(ds, column: str, epoch: str, pid_fn,
                          severity: str = "error",
                          driver_threshold: int = 50_000_000,
                          partials_ds=None):
    """ds must already be projected to [column (+ path)] — prune at the read.

    ``partials_ds`` (optional): a precomputed (khash, n, …) partial
    stream — the fused single-scan pre-pass built by validate_epoch; when
    given, this check skips its own scan over ``ds`` for phase 1."""
    import ray.data as rd

    partials = (partials_ds if partials_ds is not None else ds.map_batches(
        lambda b: _hash_partials(b, column, pid_fn), batch_format="pyarrow"
    ))
    from ._util import collect_and_reduce, decide_path

    partials, _n, distributed = decide_path(partials, driver_threshold)
    if distributed:
        # Wide candidate reduction: groupby int64 khash (never strings),
        # filter to totals > 1 — the collected result is the actual
        # duplicate set, violation-sized by assumption.
        from ray.data.aggregate import Sum

        from raqc_ray.pipelines.validate import shuffle_width

        agg = (
            partials.repartition(shuffle_width())
            .groupby("khash")
            .aggregate(Sum("n", alias_name="n"))
            .filter(expr="n > 1")
            .select_columns(["khash"])
            .to_pandas()
        )
        if len(agg) == 0 or "khash" not in agg.columns:
            return violations_dataset(empty_violations_df())
        cand = np.sort(agg["khash"].to_numpy(dtype=np.int64))
    else:
        def _dup_hashes(tbl):
            """khash totals → sorted candidate duplicate hashes (in a Ray
            task, off the driver GIL)."""
            if tbl is None:
                return None
            kh = tbl["khash"].to_numpy(zero_copy_only=False)
            nn = tbl["n"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(kh, return_inverse=True)
            totals = np.bincount(inv, weights=nn).astype(np.int64)
            cand = uniq[totals > 1]
            return np.sort(cand) if cand.size else None

        cand = collect_and_reduce(partials, _dup_hashes)
    if cand is None or len(cand) == 0:
        return violations_dataset(empty_violations_df())
    cand_ref = ray.put(cand)

    from ._util import map_blocks_collect

    kp_tbl = map_blocks_collect(
        ds, lambda b: _key_partials(b, column, pid_fn, cand_ref))
    kp = kp_tbl.to_pandas() if kp_tbl is not None else pd.DataFrame()
    if len(kp) == 0 or "key" not in kp.columns:
        return violations_dataset(empty_violations_df())
    kp = kp.groupby(["key", "partition_id"], sort=False)["n"].sum().reset_index()
    true_totals = kp.groupby("key", sort=False)["n"].sum()
    dup_lut = {k: int(v) for k, v in true_totals[true_totals > 1].items()}
    dup_rows = kp[kp["key"].isin(dup_lut)]
    return _emit(dup_rows, dup_lut, epoch, severity, column)


def _emit(dup_rows: pd.DataFrame, dup_lut: dict, epoch: str, severity: str,
          column: str):
    if len(dup_rows) == 0:
        return violations_dataset(empty_violations_df())
    out = pd.DataFrame(
        {
            "partition_id": dup_rows["partition_id"].astype("int64"),
            "epoch": epoch,
            "check": "uniqueness",
            "image_id": dup_rows["key"],
            "column": column,
            "detail": [f"key occurs {dup_lut[k]} times" for k in dup_rows["key"]],
            "severity": severity,
        }
    ).sort_values(["image_id", "partition_id"])
    return violations_dataset(out.reset_index(drop=True))
