"""Referential check (SURVEY.md §2.4 J2) — captions ⋈ images on image_id.

Scale shape (mirrors the hash-first uniqueness check): the wide join is
replaced by an int-only reduction plus an exact candidate verify —
``bytes``/captions never shuffle, and the only all-to-all is avoided
entirely below the driver threshold:

1. pass 1 tags both sides into narrow int64 partials
   ``(khash, n_img, n_cap, h_img, h_cap, pid)`` where ``khash`` hashes the
   join key and ``h_*`` hash the caption; the driver segment-reduces them
   with numpy (argsort + reduceat — C-path, ~100 ns/row);
2. candidate keys (orphan / missing / 1:1 hash-mismatch) are FEW
   (violations, not data); their khashes are broadcast and pass 2 fetches
   the real key/caption strings for exactly those rows — orphans,
   missing captions, and byte-level caption comparison are then decided
   EXACTLY on candidate-sized data.  Hash collisions only add candidate
   rows; a missed violation needs a full 64-bit collision (~2⁻⁶⁴·n).

Above ``driver_threshold`` materialized partial rows (automatic —
``decide_path``), step 1's segment reduce switches from one Ray task to a
distributed ``groupby(khash)`` aggregate whose flagged *result* (candidate
khashes, violation-sized) is the only thing collected; step 2 — the exact
byte-level candidate verify — is identical on both paths, so violations
are byte-identical regardless of path.  Multi-occurrence keys are
UniquenessCheck's finding and are skipped (FIXTURES.md §3 disjointness).
RAQC analog: grid alignment is the reference's implicit referential
integrity (``[R] raqc/multi_array.py :: clip_extent_overlap (rec.)``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Sum

from ..config import ReferentialCheck
from ..sketches.hll import hash64
from ._util import empty_violations_df, violations_dataset


def _int_partials(batch: pa.Table, spec: ReferentialCheck, pid_fn, side: int
                  ) -> pa.Table:
    n = batch.num_rows
    kh = hash64(batch[spec.key].cast(pa.string()).to_pylist()).view(np.int64)
    ch = (hash64(batch[spec.compare].cast(pa.string()).to_pylist())
          >> np.uint64(33)).astype(np.int64)
    pids = pid_fn(batch) if side == 0 else np.full(n, -1, dtype=np.int64)
    one = np.ones(n, dtype=np.int64)
    zero = np.zeros(n, dtype=np.int64)
    return pa.table(
        {
            "khash": pa.array(kh, pa.int64()),
            "n_img": pa.array(one if side == 0 else zero, pa.int64()),
            "n_cap": pa.array(zero if side == 0 else one, pa.int64()),
            "h_img": pa.array(ch if side == 0 else zero, pa.int64()),
            "h_cap": pa.array(zero if side == 0 else ch, pa.int64()),
            "pid": pa.array(pids, pa.int64()),
        }
    )


def _candidate_rows(batch: pa.Table, spec: ReferentialCheck, pid_fn, side: int,
                    cand_ref) -> pa.Table:
    cand = ray.get(cand_ref)
    keys = batch[spec.key].cast(pa.string())
    kh = hash64(keys.to_pylist()).view(np.int64)
    idx = np.clip(np.searchsorted(cand, kh), 0, len(cand) - 1)
    mask = cand[idx] == kh
    if not mask.any():
        return pa.table(
            {"image_id": pa.array([], pa.string()),
             "caption": pa.array([], pa.string()),
             "partition_id": pa.array([], pa.int64()),
             "side": pa.array([], pa.int8())}
        )
    m = pa.array(mask)
    pids = (pid_fn(batch) if side == 0 else np.full(batch.num_rows, -1,
                                                    dtype=np.int64))[mask]
    return pa.table(
        {
            "image_id": keys.filter(m),
            "caption": batch[spec.compare].cast(pa.string()).filter(m),
            "partition_id": pa.array(pids, pa.int64()),
            "side": pa.array(np.full(int(mask.sum()), side, dtype=np.int8),
                             pa.int8()),
        }
    )


def _verify_candidates(cdf: pd.DataFrame, epoch: str, severity: str
                       ) -> pd.DataFrame:
    rows = []
    for key, g in cdf.groupby("image_id", sort=False):
        imgs = g[g["side"] == 0]
        caps = g[g["side"] == 1]
        if len(imgs) == 0:
            rows.append(
                {"partition_id": -1, "epoch": epoch, "check": "referential",
                 "image_id": key, "column": "image_id",
                 "detail": f"orphan caption row: no image row for key "
                           f"({len(caps)} caption rows)", "severity": severity})
        elif len(caps) == 0:
            for pid in sorted(set(int(p) for p in imgs["partition_id"])):
                rows.append(
                    {"partition_id": pid, "epoch": epoch, "check": "referential",
                     "image_id": key, "column": "caption",
                     "detail": "image row has no caption row",
                     "severity": severity})
        elif len(imgs) == 1 and len(caps) == 1:
            a = imgs["caption"].iloc[0] or ""
            b = caps["caption"].iloc[0] or ""
            if a != b:  # exact byte comparison on the real captions
                rows.append(
                    {"partition_id": int(imgs["partition_id"].iloc[0]),
                     "epoch": epoch, "check": "referential", "image_id": key,
                     "column": "caption",
                     "detail": "caption differs between images and captions "
                               "tables", "severity": severity})
        # multi-occurrence keys: uniqueness check's finding
    return pd.DataFrame(rows) if rows else empty_violations_df()


def referential_violations(images_ds, captions_ds, spec: ReferentialCheck,
                           epoch: str, pid_fn,
                           driver_threshold: int = 50_000_000,
                           partials_ds=None):
    """images_ds projected to [image_id, caption (+path)]; captions_ds to
    [image_id, caption]. Returns a violations Dataset.  ``partials_ds``
    (optional): precomputed two-sided (khash, n_img, n_cap, h_img, h_cap)
    partials from the fused pre-pass — skips both partial scans here."""
    import ray.data as rd

    partials = (partials_ds if partials_ds is not None
                else images_ds.map_batches(
        lambda b: _int_partials(b, spec, pid_fn, 0), batch_format="pyarrow"
    ).union(
        captions_ds.map_batches(
            lambda b: _int_partials(b, spec, pid_fn, 1), batch_format="pyarrow"
        )
    ))
    from ._util import collect_and_reduce, decide_path

    partials, _n, distributed = decide_path(partials, driver_threshold)
    if distributed:
        # Wide candidate reduction over int64 partials only (strings and
        # captions never shuffle); the collected result is the candidate
        # khash set — orphans / missing / 1:1 hash-mismatch, i.e.
        # violation-sized by assumption.
        from raqc_ray.pipelines.validate import shuffle_width

        agg = (
            partials.repartition(shuffle_width())
            .groupby("khash")
            .aggregate(
                Sum("n_img", alias_name="n_img"),
                Sum("n_cap", alias_name="n_cap"),
                Sum("h_img", alias_name="h_img"),
                Sum("h_cap", alias_name="h_cap"),
            )
            .filter(
                expr="n_img == 0 or n_cap == 0 or "
                     "(n_img == 1 and n_cap == 1 and h_img != h_cap)"
            )
            .select_columns(["khash"])
            .to_pandas()
        )
        if len(agg) == 0 or "khash" not in agg.columns:
            return violations_dataset(empty_violations_df())
        cand = np.sort(agg["khash"].to_numpy(dtype=np.int64))
    else:
        def _segment_reduce(tbl):
            """int64 segment reduce → candidate khashes (runs in a Ray
            task, off the driver GIL)."""
            if tbl is None:
                return None
            kh = tbl["khash"].to_numpy(zero_copy_only=False)
            order = np.argsort(kh, kind="stable")
            ks = kh[order]
            bounds = np.flatnonzero(ks[1:] != ks[:-1]) + 1
            starts = np.concatenate([[0], bounds])
            cols = {
                c: np.add.reduceat(tbl[c].to_numpy(zero_copy_only=False)[order],
                                   starts)
                for c in ("n_img", "n_cap", "h_img", "h_cap")
            }
            flagged = (cols["n_img"] == 0) | (cols["n_cap"] == 0) | (
                (cols["n_img"] == 1) & (cols["n_cap"] == 1)
                & (cols["h_img"] != cols["h_cap"])
            )
            cand = ks[starts][flagged]
            return np.sort(cand) if cand.size else None

        cand = collect_and_reduce(partials, _segment_reduce)
    if cand is None or len(cand) == 0:
        return violations_dataset(empty_violations_df())
    cand_ref = ray.put(cand)

    from ._util import map_blocks_collect

    t_img = map_blocks_collect(
        images_ds, lambda b: _candidate_rows(b, spec, pid_fn, 0, cand_ref))
    t_cap = map_blocks_collect(
        captions_ds, lambda b: _candidate_rows(b, spec, pid_fn, 1, cand_ref))
    live = [t for t in (t_img, t_cap) if t is not None and t.num_rows > 0]
    cdf = (pa.concat_tables(live).to_pandas() if live
           else empty_violations_df().iloc[:0])
    if len(cdf) == 0 or "image_id" not in cdf.columns:
        return violations_dataset(empty_violations_df())
    out = _verify_candidates(cdf, epoch, spec.severity)
    return violations_dataset(out.reset_index(drop=True))
