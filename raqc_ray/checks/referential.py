"""Referential check (SURVEY.md §2.4 J2) — captions ⋈ images on image_id.

Implemented as a partitioned hash join expressed with Ray Data primitives:
both sides are projected to narrow columns (``bytes`` never ships through
the shuffle — SURVEY.md §4.2), tagged, unioned, and grouped by the join
key; each group inspects its composition:

- 0 image rows            → orphan caption (``partition_id = -1``)
- 0 caption rows          → image missing its caption
- 1:1 and captions differ → caption byte-mismatch

Multi-occurrence keys (duplicated image_ids) are skipped here — they are
UniquenessCheck's finding, keeping planted corruption reporting disjoint
(FIXTURES.md §3).  RAQC analog: grid alignment is the reference's implicit
referential integrity (``[R] raqc/multi_array.py :: clip_extent_overlap
(rec.)``); a key join replaces geometric alignment for tables.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..config import ReferentialCheck
from ._util import empty_violations_df


def _check_group(g: pd.DataFrame, epoch: str, severity: str) -> pd.DataFrame:
    key = g["image_id"].iloc[0]
    imgs = g[g["side"] == 0]
    caps = g[g["side"] == 1]
    rows = []
    if len(imgs) == 0:
        rows.append(
            {"partition_id": -1, "epoch": epoch, "check": "referential",
             "image_id": key, "column": "image_id",
             "detail": f"orphan caption row: no image row for key ({len(caps)} caption rows)",
             "severity": severity}
        )
    elif len(caps) == 0:
        for pid in sorted(set(int(p) for p in imgs["partition_id"])):
            rows.append(
                {"partition_id": pid, "epoch": epoch, "check": "referential",
                 "image_id": key, "column": "caption",
                 "detail": "image row has no caption row", "severity": severity}
            )
    elif len(imgs) == 1 and len(caps) == 1:
        a, b = imgs["caption"].iloc[0], caps["caption"].iloc[0]
        if (a or "") != (b or ""):
            rows.append(
                {"partition_id": int(imgs["partition_id"].iloc[0]), "epoch": epoch,
                 "check": "referential", "image_id": key, "column": "caption",
                 "detail": "caption differs between images and captions tables",
                 "severity": severity}
            )
    # multi-occurrence: uniqueness check's finding; skip here
    if not rows:
        return empty_violations_df()
    return pd.DataFrame(rows)


def referential_violations(images_ds, captions_ds, spec: ReferentialCheck,
                           epoch: str, pid_fn):
    """images_ds projected to [image_id, caption (+path)]; captions_ds to
    [image_id, caption]. Returns a violations Dataset."""

    def tag_images(batch: pa.Table) -> pa.Table:
        pids = pid_fn(batch)
        return pa.table(
            {
                "image_id": batch[spec.key].cast(pa.string()),
                "caption": batch[spec.compare].cast(pa.string()),
                "partition_id": pa.array(pids, pa.int64()),
                "side": pa.array([0] * batch.num_rows, pa.int8()),
            }
        )

    def tag_captions(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": batch[spec.key].cast(pa.string()),
                "caption": batch[spec.compare].cast(pa.string()),
                "partition_id": pa.array([-1] * batch.num_rows, pa.int64()),
                "side": pa.array([1] * batch.num_rows, pa.int8()),
            }
        )

    tagged = images_ds.map_batches(tag_images, batch_format="pyarrow").union(
        captions_ds.map_batches(tag_captions, batch_format="pyarrow")
    )
    return tagged.groupby("image_id").map_groups(
        lambda g: _check_group(g, epoch, spec.severity), batch_format="pandas"
    )
