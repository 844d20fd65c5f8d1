"""Near-duplicate detection on a 64-bit hash column (SURVEY.md §2.5 A10).

Pigeonhole LSH banding: the 64 phash bits split into ``max_hamming + 1``
bands (widths 22/21/21 for the default Hamming ≤ 2) — any pair within the
Hamming budget matches exactly in at least one band, so co-locating by
band bucket catches every candidate pair.  Only buckets with ≥2 members
(a broadcast collision set from a pre-count) enter the sorted-block group
scan (ops/groupscan.py — one map task per sorted block instead of one
Python call per bucket); groups are scanned all-pairs with numpy popcount
(unpackbits), and pairs found in multiple bands are deduplicated on the
canonical pair key (driver-side — pairs are violation-sized by assumption).

Skew handling (BASELINE.json:14 "salted keys for hot phash buckets"):
a pre-aggregated bucket-size pass (partial counts per batch → tiny
groupby) identifies buckets above ``hot_bucket_cap``; the hot set is
broadcast via ``ray.put`` and the shuffle key for hot buckets is salted
with 8 phash bits drawn from *outside* the band, splitting the bucket into
≤256 sub-buckets that scan independently.  Documented tradeoff: a true
near-dup pair inside a hot bucket whose differing bits include the salt
bits can be missed in that band (it is still found via any non-hot band it
shares); cold buckets have exact pigeonhole recall.  RAQC analog: none —
nearest is the moving-window block filter taming speckle
(``[R] raqc/multi_array.py :: PatternFilters.mov_wind2 (rec.)``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..config import NearDupCheck
from ._util import (empty_violations_df, grouped_counts,
                    violations_dataset)

# (start_bit, width) per band for max_hamming=2
BANDS_3 = ((0, 22), (22, 21), (43, 21))
# salt bits per band — always outside the band's own bit range
SALT_SHIFT_3 = (56, 0, 0)


def _bands_for(max_hamming: int):
    nb = max_hamming + 1
    widths = [64 // nb + (1 if i < 64 % nb else 0) for i in range(nb)]
    bands, start = [], 0
    for w_ in widths:
        bands.append((start, w_))
        start += w_
    salts = [(56 if s == 0 else 0) for s, _ in bands]
    return tuple(bands), tuple(salts)


def _buckets_of(ph: np.ndarray, bands) -> list[np.ndarray]:
    """Per-band bucket keys for a uint64 phash vector (vectorized)."""
    out = []
    for b, (start, width) in enumerate(bands):
        mask = np.uint64((1 << width) - 1)
        val = (ph >> np.uint64(start)) & mask
        out.append(((np.uint64(b) << np.uint64(22)) | val).view(np.int64))
    return out


def _phash_bucket_counts(batch: pa.Table, spec: NearDupCheck, bands) -> pa.Table:
    """Bucket partial counts straight from the phash column — the size
    pre-pass never touches the id strings at all."""
    ph = batch[spec.column].to_numpy(zero_copy_only=False).astype(np.int64).view(
        np.uint64
    )
    allb = np.concatenate(_buckets_of(ph, bands))
    uniq, counts = np.unique(allb, return_counts=True)
    return pa.table(
        {"bucket": pa.array(uniq, pa.int64()), "n": pa.array(counts, pa.int64())}
    )


def _bucket_partial_counts(batch: pa.Table) -> pa.Table:
    b = batch["bucket"].to_numpy(zero_copy_only=False)
    uniq, counts = np.unique(b, return_counts=True)
    return pa.table(
        {"bucket": pa.array(uniq, pa.int64()), "n": pa.array(counts, pa.int64())}
    )


def _popcount_matrix(x: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distances of a uint64 vector (all-pairs, vectorized)."""
    xor = x[:, None] ^ x[None, :]
    b = xor.view(np.uint8).reshape(len(x), len(x), 8)
    return np.unpackbits(b, axis=2).sum(axis=2)


def _scan_groups_arrays(keys: np.ndarray, ph: np.ndarray, ids: np.ndarray,
                        pids: np.ndarray, max_h: int) -> pd.DataFrame:
    """Scan MANY key-groups at once from sorted arrays — pure numpy per
    group (no pandas slicing), pair assembly vectorized at the end."""
    order = np.argsort(keys, kind="stable")
    keys, ph, ids, pids = keys[order], ph[order], ids[order], pids[order]
    bounds = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(keys)]])
    ii_all, jj_all, dd_all = [], [], []
    for s, e in zip(starts.tolist(), ends.tolist()):
        n = e - s
        if n < 2:
            continue
        sub = ph[s:e]
        if n <= 2048:
            dist = _popcount_matrix(sub)
            li, lj = np.nonzero(np.triu(dist <= max_h, k=1))
            if len(li):
                ii_all.append(li + s)
                jj_all.append(lj + s)
                dd_all.append(dist[li, lj])
        else:
            sorder = np.argsort(sub, kind="stable")
            sph = sub[sorder]
            for k in range(1, min(64, n)):
                x = sph[:-k] ^ sph[k:]
                d = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1
                                  ).sum(axis=1)
                hit = np.flatnonzero(d <= max_h)
                if len(hit):
                    ii_all.append(sorder[hit] + s)
                    jj_all.append(sorder[hit + k] + s)
                    dd_all.append(d[hit])
    if not ii_all:
        return pd.DataFrame(
            {"pair_key": pd.Series(dtype="object"),
             "id_a": pd.Series(dtype="object"), "id_b": pd.Series(dtype="object"),
             "pid_a": pd.Series(dtype="int64"), "pid_b": pd.Series(dtype="int64"),
             "dist": pd.Series(dtype="int64")}
        )
    ii = np.concatenate(ii_all)
    jj = np.concatenate(jj_all)
    dd = np.concatenate(dd_all)
    a_first = ids[ii] <= ids[jj]
    id_a = np.where(a_first, ids[ii], ids[jj])
    id_b = np.where(a_first, ids[jj], ids[ii])
    pid_a = np.where(a_first, pids[ii], pids[jj]).astype(np.int64)
    pid_b = np.where(a_first, pids[jj], pids[ii]).astype(np.int64)
    return pd.DataFrame(
        {"pair_key": np.char.add(np.char.add(id_a.astype(str), "|"),
                                 id_b.astype(str)),
         "id_a": id_a, "id_b": id_b, "pid_a": pid_a, "pid_b": pid_b,
         "dist": dd.astype(np.int64)}
    )


def _scan_group(g: pd.DataFrame, max_h: int) -> pd.DataFrame:
    n = len(g)
    if n < 2:
        return pd.DataFrame(
            {"pair_key": pd.Series(dtype="object"),
             "id_a": pd.Series(dtype="object"), "id_b": pd.Series(dtype="object"),
             "pid_a": pd.Series(dtype="int64"), "pid_b": pd.Series(dtype="int64"),
             "dist": pd.Series(dtype="int64")}
        )
    ph = g["phash"].to_numpy().astype(np.int64).view(np.uint64)
    ids = g["image_id"].to_numpy()
    pids = g["partition_id"].to_numpy()
    if n <= 2048:
        dist = _popcount_matrix(ph)
        ii, jj = np.nonzero(np.triu(dist <= max_h, k=1))
        dists = dist[ii, jj]
    else:
        # Degenerate sub-group even after salting (e.g. one constant phash
        # value at scale): sorted-window scan — O(n·W) with bounded memory.
        order = np.argsort(ph, kind="stable")
        sph, W = ph[order], 64
        ii_l, jj_l, dd_l = [], [], []
        for k in range(1, min(W, n)):
            x = sph[:-k] ^ sph[k:]
            d = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
            hit = np.flatnonzero(d <= max_h)
            ii_l.append(order[hit])
            jj_l.append(order[hit + k])
            dd_l.append(d[hit])
        ii = np.concatenate(ii_l) if ii_l else np.empty(0, np.int64)
        jj = np.concatenate(jj_l) if jj_l else np.empty(0, np.int64)
        dists = np.concatenate(dd_l) if dd_l else np.empty(0, np.int64)
    rows = []
    for i, j, dij in zip(ii.tolist(), jj.tolist(), dists.tolist()):
        a, b = (i, j) if str(ids[i]) <= str(ids[j]) else (j, i)
        rows.append(
            {
                "pair_key": f"{ids[a]}|{ids[b]}",
                "id_a": ids[a],
                "id_b": ids[b],
                "pid_a": int(pids[a]),
                "pid_b": int(pids[b]),
                "dist": int(dij),
            }
        )
    if not rows:
        return _scan_group(g.iloc[:1], max_h)  # typed empty frame
    return pd.DataFrame(rows)


def _pairs_to_violations(batch: pa.Table, epoch: str, severity: str) -> pa.Table:
    df = batch.to_pandas()
    rows = []
    for r in df.itertuples(index=False):
        rows.append((int(r.pid_a), epoch, "near_dup", str(r.id_a), "phash",
                     f"near-dup of {r.id_b} (hamming={r.dist})", severity))
        rows.append((int(r.pid_b), epoch, "near_dup", str(r.id_b), "phash",
                     f"near-dup of {r.id_a} (hamming={r.dist})", severity))
    if not rows:
        return pa.Table.from_pandas(empty_violations_df(), preserve_index=False)
    cols = list(zip(*rows))
    names = ["partition_id", "epoch", "check", "image_id", "column", "detail",
             "severity"]
    return pa.table({nm: pa.array(list(c)) for nm, c in zip(names, cols)})


def neardup_violations(ds, spec: NearDupCheck, epoch: str, pid_fn,
                       driver_threshold: int = 20_000_000,
                       partials_ds=None):
    """ds projected to [image_id, phash (+path)]. Returns a violations
    Dataset.  ``partials_ds`` (optional): precomputed (bucket, n) partial
    counts from the fused pre-pass — skips this check's own size scan."""
    bands, salts = _bands_for(spec.max_hamming)
    # Pre-aggregated bucket sizes straight from [phash] (no id strings) →
    # two broadcast sets:
    #  - colliding (n >= 2): only these buckets can contain a pair — the
    #    keyed scan shrinks from ~n groups to collision-sized
    #  - hot (n > cap): shuffle key gets salted (skew handling, B:14)
    sizes_tbl = grouped_counts(
        partials_ds if partials_ds is not None else ds.map_batches(
            lambda b: _phash_bucket_counts(b, spec, bands), batch_format="pyarrow"
        ),
        ["bucket"], min_total=2,
    )
    if len(sizes_tbl) == 0:
        return violations_dataset(empty_violations_df())
    colliding = np.sort(sizes_tbl["bucket"].to_numpy(dtype=np.int64))
    hot = set(
        sizes_tbl.loc[sizes_tbl["n"] > spec.hot_bucket_cap, "bucket"].tolist()
    )
    sets_ref = ray.put((colliding, hot))

    def explode_colliding(batch: pa.Table) -> pa.Table:
        """Fused explode + collision filter + salted key: emits only rows
        whose band bucket can contain a pair — typically a tiny fraction,
        so the sort that follows moves collision-sized data."""
        coll, hot_set = ray.get(sets_ref)
        pids = pid_fn(batch)
        ph = batch[spec.column].to_numpy(zero_copy_only=False).astype(
            np.int64).view(np.uint64)
        ids_col = batch["image_id"].cast(pa.string())
        harr = (np.fromiter(hot_set, dtype=np.int64, count=len(hot_set))
                if hot_set else None)
        parts = []
        for b, bucket in enumerate(_buckets_of(ph, bands)):
            idx = np.clip(np.searchsorted(coll, bucket), 0, len(coll) - 1)
            keep = coll[idx] == bucket
            if not keep.any():
                continue
            kb = bucket[keep]
            salt = ((ph[keep] >> np.uint64(salts[b])) & np.uint64(0xFF)).astype(
                np.int64)
            is_hot = np.isin(kb, harr) if harr is not None else np.zeros(
                len(kb), dtype=bool)
            key = kb * 257 + np.where(is_hot, salt + 1, 0)
            keep_pa = pa.array(keep)
            parts.append(
                pa.table(
                    {
                        "key": pa.array(key, pa.int64()),
                        "image_id": ids_col.filter(keep_pa),
                        "phash": pa.array(ph[keep].view(np.int64), pa.int64()),
                        "partition_id": pa.array(pids[keep], pa.int64()),
                    }
                )
            )
        if not parts:
            return pa.table(
                {"key": pa.array([], pa.int64()),
                 "image_id": pa.array([], pa.string()),
                 "phash": pa.array([], pa.int64()),
                 "partition_id": pa.array([], pa.int64())}
            )
        return pa.concat_tables(parts)

    keyed = ds.map_batches(explode_colliding, batch_format="pyarrow")
    import ray.data as rd

    empty_pairs = _scan_group(pd.DataFrame({"image_id": [], "phash": [],
                                            "partition_id": [], "key": []}),
                              spec.max_hamming)
    # Single-task scan below ``driver_threshold`` collision rows:
    # collision rows are collision-sized (pigeonhole on 2^21+ buckets
    # keeps them a small fraction of the table, salting caps any one
    # group) — one vectorized multi-group numpy scan in a Ray task beats
    # a sort shuffle + distributed scan by ~10× at these sizes, and keeps
    # the driver GIL free for the concurrent epoch.  Above the threshold
    # (automatic, by materialized row count) the distributed sorted-block
    # scan (ops/groupscan.py) runs; RAQC_DISTRIBUTED_SCAN overrides.
    from ._util import decide_path

    keyed, _n, distributed = decide_path(keyed, driver_threshold)
    if not distributed:
        from ._util import collect_and_reduce

        max_h = spec.max_hamming

        def _scan_reduce(tbl):
            if tbl is None or tbl.num_rows == 0:
                return None
            return _scan_groups_arrays(
                tbl["key"].to_numpy(zero_copy_only=False).astype(np.int64),
                tbl["phash"].to_numpy(zero_copy_only=False).astype(
                    np.int64).view(np.uint64),
                np.asarray(tbl["image_id"].to_pylist(), dtype=object),
                tbl["partition_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64),
                max_h,
            )

        all_pairs = collect_and_reduce(keyed, _scan_reduce)
        if all_pairs is None:
            all_pairs = empty_pairs
    else:
        from ..ops.groupscan import scan_sorted_groups

        pairs_ds = scan_sorted_groups(
            keyed, "key", lambda g: _scan_group(g, spec.max_hamming), empty_pairs
        )
        all_pairs = pairs_ds.to_pandas()
    # dedup pairs found in multiple bands (canonical pair key); pairs are
    # violation-sized, so the violations table is built eagerly — the
    # caller gets a Dataset plus the stashed frame (no extra execution)
    uniq = all_pairs.drop_duplicates("pair_key")
    vio_tbl = _pairs_to_violations(
        pa.Table.from_pandas(uniq if len(uniq) else empty_pairs,
                             preserve_index=False),
        epoch, spec.severity)
    return violations_dataset(vio_tbl.to_pandas())
