"""Referential check (SURVEY.md §2.4 J2) — captions ⋈ images on image_id.

Implemented as a single hash-partitioned groupby-AGGREGATE (all C-path
kernels, no per-group Python): both sides are projected to narrow columns
(``bytes`` never ships — SURVEY.md §4.2), tagged into one partial-row
schema ``(image_id, partition_id, n_img, n_cap, h_img, h_cap)`` where
``h_*`` is a deterministic 64-bit caption hash, and aggregated per key.
Violation classes then fall out of vectorized filters over the
violation-sized aggregate:

- ``n_img == 0``                         → orphan caption (partition −1)
- ``n_cap == 0``                         → image missing its caption
- ``n_img == 1 ∧ n_cap == 1 ∧ h_img ≠ h_cap`` → caption mismatch
  (equality via summed hashes — exact for 1:1 groups; int64 wraparound is
  deterministic on both sides)

Multi-occurrence keys are UniquenessCheck's finding and are skipped,
keeping planted corruption reporting disjoint (FIXTURES.md §3).  RAQC
analog: grid alignment is the reference's implicit referential integrity
(``[R] raqc/multi_array.py :: clip_extent_overlap (rec.)``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Max, Sum

from ..config import ReferentialCheck
from ..sketches.hll import hash64
from ._util import empty_violations_df


def _tag(batch: pa.Table, spec: ReferentialCheck, pid_fn, side: int) -> pa.Table:
    n = batch.num_rows
    keys = batch[spec.key].cast(pa.string())
    caps = batch[spec.compare].cast(pa.string())
    # 31-bit hash: sums over a group can never overflow int64 (an overflow
    # makes ray/pandas fall back to pickled-object columns and breaks the
    # downstream filter).  Equality via 31 bits misses a true mismatch with
    # p = 2^-31 per key — negligible against the check's purpose.
    h = (hash64(caps.to_pylist()) >> np.uint64(33)).astype(np.int64)
    pids = pid_fn(batch) if side == 0 else np.full(n, -1, dtype=np.int64)
    one = np.ones(n, dtype=np.int64)
    zero = np.zeros(n, dtype=np.int64)
    return pa.table(
        {
            "image_id": keys,
            "partition_id": pa.array(pids, pa.int64()),
            "n_img": pa.array(one if side == 0 else zero, pa.int64()),
            "n_cap": pa.array(zero if side == 0 else one, pa.int64()),
            "h_img": pa.array(h if side == 0 else zero, pa.int64()),
            "h_cap": pa.array(zero if side == 0 else h, pa.int64()),
        }
    )


def _emit(batch: pa.Table, epoch: str, severity: str) -> pa.Table:
    df = batch.to_pandas()
    orphan = df["n_img"] == 0
    missing = (df["n_cap"] == 0) & (df["n_img"] >= 1)
    mismatch = (
        (df["n_img"] == 1) & (df["n_cap"] == 1) & (df["h_img"] != df["h_cap"])
    )
    frames = []
    for mask, column, detail, pid_col in (
        (orphan, "image_id", "orphan caption row: no image row for key", "pid"),
        (missing, "caption", "image row has no caption row", "pid"),
        (mismatch, "caption",
         "caption differs between images and captions tables", "pid"),
    ):
        sel = df[mask]
        if len(sel) == 0:
            continue
        frames.append(
            pd.DataFrame(
                {
                    "partition_id": sel["pid"].astype("int64"),
                    "epoch": epoch,
                    "check": "referential",
                    "image_id": sel["image_id"],
                    "column": column,
                    "detail": detail,
                    "severity": severity,
                }
            )
        )
    if not frames:
        return pa.Table.from_pandas(empty_violations_df(), preserve_index=False)
    return pa.Table.from_pandas(pd.concat(frames, ignore_index=True),
                                preserve_index=False)


def referential_violations(images_ds, captions_ds, spec: ReferentialCheck,
                           epoch: str, pid_fn):
    """images_ds projected to [image_id, caption (+path)]; captions_ds to
    [image_id, caption]. Returns a violations Dataset."""
    tagged = images_ds.map_batches(
        lambda b: _tag(b, spec, pid_fn, 0), batch_format="pyarrow"
    ).union(
        captions_ds.map_batches(
            lambda b: _tag(b, spec, pid_fn, 1), batch_format="pyarrow"
        )
    )
    totals = tagged.groupby("image_id").aggregate(
        Sum("n_img", alias_name="n_img"),
        Sum("n_cap", alias_name="n_cap"),
        Sum("h_img", alias_name="h_img"),
        Sum("h_cap", alias_name="h_cap"),
        Max("partition_id", alias_name="pid"),
    )
    flagged = totals.filter(
        expr="n_img == 0 or n_cap == 0 or "
             "(n_img == 1 and n_cap == 1 and h_img != h_cap)"
    )
    return flagged.map_batches(
        lambda b: _emit(b, epoch, spec.severity), batch_format="pyarrow"
    )
