"""Deterministic synthetic image+caption fixtures (FIXTURES.md).

Generates, per epoch, one parquet file per partition (the Lance stand-in;
SURVEY.md §7) with the binding 7-column images schema, a captions side
table, and ground-truth expectation files derived from the corruption
matrix.  All randomness flows from ``numpy.random.default_rng`` seeded with
``(seed, epoch_index, row_index)`` so any row is reproducible in isolation
(no wall clock, no external data).

RAQC analog: the two input date1/date2 rasters plus planted outliers that
the golden run must flag (``[R] raqc/tests fixtures (rec., L)``, SURVEY.md §5).
``e2`` plants a distribution shift (width p(256) += 0.2, pixel means +15)
so the drift check has a positive case — the analog of real snow change
between repeat flights.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .codecs import encode_image, phash64, synth_image
from .schema import CAPTIONS_SCHEMA, IMAGES_SCHEMA

# bump when the corruption plan / image content changes: generate()
# regenerates any cached fixture whose done-marker carries an older
# version (rounds 1-4 had no marker version = version 1)
FIXTURE_VERSION = 2

# name -> (rows_per_epoch, rows_per_partition)
PROFILES = {
    "t1": (1_000, 250),
    "t2": (10_000, 1_250),
    "bench": (100_000, 782),  # 128 partitions: the per-round bench fixture
    # scaling-proxy fixture: 4× the work so the 32-CPU run is not
    # startup-latency-bound (512 partitions ≥ 4× the larger CPU count)
    "benchxl": (400_000, 782),
    # jpeg-payload scaling fixture: the REPRESENTATIVE payload for an
    # image+caption table (production tables are overwhelmingly JPEG);
    # decode work per byte is ~500× the lossless formats, which moves the
    # proxy out of the residue-bound regime the lossless fixture sits in
    # at this disk budget (see BASELINE.md)
    "benchjpeg": (50_000, 782),
}

DIMS = np.array([32, 64, 96, 128, 256], dtype=np.int32)
DIM_P_E1 = np.array([0.30, 0.28, 0.20, 0.15, 0.07])
DIM_P_E2 = np.array([0.25, 0.23, 0.15, 0.10, 0.27])  # p(256) += 0.2 (drift)

VOCAB = (
    "snow depth basin lidar raster band elevation drift flag pixel mountain "
    "river watershed melt accumulation survey flight repeat epoch cloud "
    "forest canopy valley ridge slope aspect sensor array quality check "
    "image caption pair table column batch stream shuffle partition verdict "
    "violation sketch digest histogram quantile outlier threshold window "
    "neighbor block mask overlap clip extent grid cell meter winter spring"
).split()


# ---------------------------------------------------------- corruption plan


@dataclass(frozen=True)
class CorruptionPlan:
    """Deterministic, disjoint planted-violation row indices (FIXTURES.md §3)."""

    caption_null: tuple = (0, 1, 2, 3, 4)
    bytes_null: tuple = (5, 6, 7, 8, 9)
    range_rows: tuple = (10, 11, 12, 13, 14)  # w=0, h=-5, w=20000, h=0, len(bytes)=0
    caption_empty: tuple = (23, 24, 25, 26, 27)
    decode_garbage: tuple = (50, 51, 52, 53, 54)
    decode_dims: tuple = (55, 56, 57, 58, 59)
    caption_missing: tuple = (60, 61, 62)  # image rows with no caption row
    caption_mismatch: tuple = (63, 64, 65)
    neardup_src: tuple = (30, 31, 32, 33, 34, 35)
    neardup_dst: tuple = (70, 71, 72, 73, 74, 75)
    hot_bucket: tuple = tuple(range(100, 150))
    # cross-column expr violations: 32×16 images (declared == decoded,
    # so only the min_area rule trips — w·h = 512 < 1024)
    expr_rows: tuple = (160, 161, 162)
    # clipped-exposure violations: bytes hold a 0.05×-darkened render
    # (1000‰ of luma cents ≤ lo_c) while phash keeps the CLEAN
    # pattern's hash so the near-dup check stays disjoint
    exposure_rows: tuple = (165, 166, 167, 168)
    n_orphans: int = 3

    def uniq_pairs(self, rows: int, rp: int) -> list[tuple[int, int]]:
        """4 duplicated-image_id pairs, within and across partitions."""
        pairs = [(15, 16)]
        for k, src in enumerate((17, 18, 19)):
            dst = ((k + 1) * rp + src) % rows
            if dst == src:
                dst = (src + 1) % rows
            pairs.append((src, dst))
        return pairs


PLAN = CorruptionPlan()


def _row_rng(seed: int, epoch_idx: int, i: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence((seed, epoch_idx, i)))


def _caption(rng: np.random.Generator) -> str:
    n = int(rng.integers(3, 31))
    return " ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), n))


def generate_partition(
    out_dir: str,
    epoch: str,
    pid: int,
    rows: int,
    rows_per_partition: int,
    seed: int,
    drift: bool,
    sample_pixels_dir: str | None = None,
    sample_stride: int = 0,
    jpeg_frac: float = 0.0,
    dim_spec: tuple | None = None,
) -> tuple[list[str], list[str | None]]:
    """Generate + write one partition's parquet file; returns this
    partition's (caption_ids, caption_texts) contribution to the captions
    side table.  Pure function of (seed, epoch, pid) — safe to run
    partitions in parallel Ray tasks (bench-size generation) and to
    regenerate any single partition (resume tests)."""
    assert rows_per_partition >= 150, "corruption plan needs >=150 rows in partition 0"
    epoch_idx = 1 if drift else 0
    if dim_spec is not None:
        # profile-pinned dims (e.g. benchjpeg: all 64×64 — pure-python
        # jpeg entropy coding is superlinear in nonzero coefficients, so
        # the scaling fixture pins a mid-size image)
        dims_arr, dim_p = (np.asarray(dim_spec[0], dtype=np.int32),
                           np.asarray(dim_spec[1]))
    else:
        dims_arr = DIMS
        dim_p = DIM_P_E2 if drift else DIM_P_E1
    brightness = 15 if drift else 0
    plan = PLAN
    lo, hi = pid * rows_per_partition, min((pid + 1) * rows_per_partition, rows)
    n = hi - lo

    uniq_pairs = plan.uniq_pairs(rows, rows_per_partition)
    dup_of = {dst: src for src, dst in uniq_pairs}

    def rid(i: int) -> str:
        return f"img-{epoch}-{dup_of.get(i, i):09d}"

    ids = [rid(i) for i in range(lo, hi)]
    bytes_arr: list[bytes | None] = [None] * n
    w_arr = np.zeros(n, dtype=np.int32)
    h_arr = np.zeros(n, dtype=np.int32)
    fmt_arr: list[str] = [""] * n
    caption_arr: list[str | None] = [None] * n
    phash_arr = np.zeros(n, dtype=np.int64)

    if sample_pixels_dir:
        os.makedirs(sample_pixels_dir, exist_ok=True)

    expr_set = set(plan.expr_rows)
    expo_set = set(plan.exposure_rows)
    for i in range(lo, hi):
        j = i - lo
        rng = _row_rng(seed, epoch_idx, i)
        di = rng.choice(len(dims_arr), p=dim_p)
        dj = rng.choice(len(dims_arr), p=dim_p)
        w, h = int(dims_arr[di]), int(dims_arr[dj])
        if i in expr_set:
            # min_area plant: 512 px, decoded dims still match declared
            # (draw order above is preserved so other rows' streams are
            # unchanged)
            w, h = 32, 16
        # single rng draw keeps the stream identical to jpeg_frac=0 runs
        # (bench fixtures stay byte-for-byte reproducible)
        r = rng.random()
        if r < jpeg_frac:
            fmt = "jpeg"
        else:
            fmt = "ppm" if r < jpeg_frac + (1.0 - jpeg_frac) / 2 else "png"
        img = synth_image(rng, w, h, brightness=brightness)
        w_arr[j], h_arr[j] = w, h
        fmt_arr[j] = fmt
        bytes_arr[j] = encode_image(img, fmt)
        caption_arr[j] = _caption(rng)
        phash_arr[j] = phash64(img)
        if i in expo_set:
            # exposure plant: encode a darkened render (every luma cent
            # ≤ lo_c) but keep the clean pattern's phash — near-dup
            # and decode stay disjoint (dims/format untouched)
            dark = (img.astype(np.float64) * 0.05).astype(np.uint8)
            bytes_arr[j] = encode_image(dark, fmt)
        if (
            sample_pixels_dir
            and sample_stride
            and i % sample_stride == 0
            and i >= 200  # clean rows only (corruptions live in low indices)
        ):
            np.save(os.path.join(sample_pixels_dir, f"{ids[j]}.npy"), img)

    # --- plant corruptions (global row indices; FIXTURES.md §3) ---
    def local(idx_tuple):
        return [i - lo for i in idx_tuple if lo <= i < hi]

    for j in local(plan.caption_null):
        caption_arr[j] = None
    for j in local(plan.bytes_null):
        bytes_arr[j] = None
    rr = plan.range_rows
    range_plants = [(w_arr, 0), (h_arr, -5), (w_arr, 20_000), (h_arr, 0)]
    for k, (arr, v) in enumerate(range_plants):
        if lo <= rr[k] < hi:
            arr[rr[k] - lo] = v
    if lo <= rr[4] < hi:
        bytes_arr[rr[4] - lo] = b""
    for j in local(plan.caption_empty):
        caption_arr[j] = ""
    for i in plan.decode_garbage:
        if lo <= i < hi:
            j = i - lo
            orig = bytes_arr[j]
            rng = _row_rng(seed, epoch_idx, rows + i)  # disjoint stream
            bytes_arr[j] = (
                orig[: max(8, len(orig) // 3)]
                if rng.random() < 0.5
                else b"\x00garbage" * 4
            )
    for j in local(plan.decode_dims):
        w_arr[j] = int(w_arr[j]) + 8  # declared != decoded dims
    for k in range(len(plan.neardup_src)):
        src, dst = plan.neardup_src[k], plan.neardup_dst[k]
        if lo <= dst < hi:  # src and dst both live in partition 0 (rp >= 150)
            nflip = 1 + (k % 2)
            ph = int(phash_arr[src - lo])
            for b in range(nflip):
                ph ^= 1 << (5 + 7 * b + k)
            phash_arr[dst - lo] = np.int64(
                np.uint64(ph & 0xFFFFFFFFFFFFFFFF).astype(np.int64)
            )
    # hot bucket: rows sharing the band-2 prefix (top 22 bits), random low bits
    hot_rng = _row_rng(seed, epoch_idx, 2 * rows + 7)
    prefix = np.uint64(0x2ACE5 & 0x3FFFFF) << np.uint64(42)
    for i in plan.hot_bucket:
        low = np.uint64(hot_rng.integers(0, 1 << 42, dtype=np.uint64))
        if lo <= i < hi:
            phash_arr[i - lo] = np.int64((prefix | low).astype(np.int64))

    tbl = pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bytes_arr, pa.binary()),
            "w": pa.array(w_arr, pa.int32()),
            "h": pa.array(h_arr, pa.int32()),
            "fmt": pa.array(fmt_arr, pa.string()),
            "caption": pa.array(caption_arr, pa.string()),
            "phash": pa.array(phash_arr, pa.int64()),
        },
        schema=IMAGES_SCHEMA,
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, f"part-{pid:05d}.parquet"))

    # --- captions contribution (FIXTURES.md §2) ---
    cap_ids, cap_texts = [], []
    missing = set(plan.caption_missing)
    mismatch = set(plan.caption_mismatch)
    for i in range(lo, hi):
        if i in missing:
            continue
        j = i - lo
        cap_ids.append(ids[j])
        if i in mismatch:
            cap_texts.append((caption_arr[j] or "") + " MISMATCH")
        else:
            cap_texts.append(caption_arr[j])
    return cap_ids, cap_texts


def generate_epoch(
    out_dir: str,
    epoch: str,
    rows: int,
    rows_per_partition: int,
    seed: int,
    drift: bool,
    sample_pixels_dir: str | None = None,
    n_pixel_samples: int = 64,
    parallel: bool = False,
    jpeg_frac: float = 0.0,
    dim_spec: tuple | None = None,
) -> dict:
    """Write one epoch's partitioned parquet + captions table.

    ``parallel=True`` fans partitions out as Ray tasks (requires an
    initialized Ray session — used by bench-size generation only).
    """
    os.makedirs(out_dir, exist_ok=True)
    n_parts = (rows + rows_per_partition - 1) // rows_per_partition
    stride = max(1, rows // n_pixel_samples)
    args = [
        (out_dir, epoch, pid, rows, rows_per_partition, seed, drift,
         sample_pixels_dir, stride, jpeg_frac, dim_spec)
        for pid in range(n_parts)
    ]
    if parallel:
        import ray

        gen = ray.remote(num_cpus=1)(generate_partition)
        chunks = ray.get([gen.remote(*a) for a in args])
    else:
        chunks = [generate_partition(*a) for a in args]

    cap_ids: list[str] = []
    cap_texts: list[str | None] = []
    for cids, ctexts in chunks:
        cap_ids.extend(cids)
        cap_texts.extend(ctexts)
    for k in range(PLAN.n_orphans):
        cap_ids.append(f"orphan-{epoch}-{k}")
        cap_texts.append(f"orphan caption {k}")
    cap_tbl = pa.table(
        {"image_id": pa.array(cap_ids, pa.string()),
         "caption": pa.array(cap_texts, pa.string())},
        schema=CAPTIONS_SCHEMA,
    )
    pq.write_table(cap_tbl, os.path.join(out_dir, "captions.parquet"))

    return {
        "epoch": epoch,
        "rows": rows,
        "rows_per_partition": rows_per_partition,
        "n_partitions": n_parts,
        "uniq_pairs": PLAN.uniq_pairs(rows, rows_per_partition),
    }


def generate(root: str, profile: str = "t1", seed: int = 42,
             parallel: bool = False) -> dict:
    """Generate both epochs + expectations under ``root``; idempotent via a
    done-marker. Returns the fixture manifest.  ``parallel=True`` fans
    partition generation out as Ray tasks (bench-size fixtures)."""
    rows, rp = PROFILES[profile]
    # lossy rows exercise the PSNR >= 40 dB decode invariant; bench
    # profiles stay lossless (pure-python jpeg decode is ~10 ms/img —
    # a throughput fixture must not be dominated by it)
    jpeg_frac = {"t1": 0.2, "t2": 0.2, "benchjpeg": 1.0}.get(profile, 0.0)
    dim_spec = ([64], [1.0]) if profile == "benchjpeg" else None
    marker = os.path.join(root, "FIXTURE_DONE.json")
    if os.path.exists(marker):
        with open(marker) as f:
            m = json.load(f)
        if m.get("fixture_version") == FIXTURE_VERSION:
            return m
        # stale corruption plan: regenerate in place (filenames are
        # deterministic, so overwriting is a full refresh)
        os.remove(marker)
    os.makedirs(root, exist_ok=True)
    m1 = generate_epoch(
        os.path.join(root, "e1"), "e1", rows, rp, seed, drift=False,
        sample_pixels_dir=os.path.join(root, "expected", "pixels", "e1"),
        parallel=parallel, jpeg_frac=jpeg_frac, dim_spec=dim_spec,
    )
    m2 = generate_epoch(
        os.path.join(root, "e2"), "e2", rows, rp, seed + 1, drift=True,
        sample_pixels_dir=os.path.join(root, "expected", "pixels", "e2"),
        parallel=parallel, jpeg_frac=jpeg_frac, dim_spec=dim_spec,
    )
    manifest = {
        "fixture_version": FIXTURE_VERSION,
        "profile": profile,
        "seed": seed,
        "rows": rows,
        "rows_per_partition": rp,
        "n_partitions": m1["n_partitions"],
        "epochs": {"e1": {"dir": os.path.join(root, "e1")},
                   "e2": {"dir": os.path.join(root, "e2")}},
        "uniq_pairs": m1["uniq_pairs"],
    }
    with open(marker, "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


# ------------------------------------------------- expected planted counts


def expected_violation_keys(manifest: dict, epoch: str) -> list[tuple]:
    """Ground-truth violation keys (partition_id, epoch, check, image_id, column)
    implied by the corruption plan — the golden comparison set (FIXTURES.md §4).

    Near-dup hot-bucket rows are excluded: they share a bucket but are not
    within Hamming ≤ 2 of each other (they exercise skew handling, not
    detection).
    """
    rows = manifest["rows"]
    rp = manifest["rows_per_partition"]
    plan = PLAN

    def pid(i: int) -> int:
        return i // rp

    def iid(i: int) -> str:
        return f"img-{epoch}-{i:09d}"

    keys: list[tuple] = []
    for i in plan.caption_null:
        keys.append((pid(i), epoch, "nullity", iid(i), "caption"))
    for i in plan.bytes_null:
        keys.append((pid(i), epoch, "nullity", iid(i), "bytes"))
    rr = plan.range_rows
    keys.append((pid(rr[0]), epoch, "range", iid(rr[0]), "w"))
    keys.append((pid(rr[1]), epoch, "range", iid(rr[1]), "h"))
    keys.append((pid(rr[2]), epoch, "range", iid(rr[2]), "w"))
    keys.append((pid(rr[3]), epoch, "range", iid(rr[3]), "h"))
    keys.append((pid(rr[4]), epoch, "range", iid(rr[4]), "bytes"))
    for i in plan.caption_empty:
        keys.append((pid(i), epoch, "caption", iid(i), "caption"))
    for i in plan.decode_garbage:
        keys.append((pid(i), epoch, "decode", iid(i), "bytes"))
    for i in plan.decode_dims:
        keys.append((pid(i), epoch, "decode", iid(i), "w"))
    for i in plan.expr_rows:
        keys.append((pid(i), epoch, "expr", iid(i), "min_area"))
    for i in plan.exposure_rows:
        keys.append((pid(i), epoch, "exposure", iid(i), "bytes"))
    # uniqueness: one violation per (image_id, partition) occurrence pair
    for src, dst in manifest["uniq_pairs"]:
        for p in sorted({pid(src), pid(dst)}):
            keys.append((p, epoch, "uniqueness", iid(src), "image_id"))
    # near-dup: one violation per pair member
    for k in range(len(plan.neardup_src)):
        s, d = plan.neardup_src[k], plan.neardup_dst[k]
        keys.append((pid(s), epoch, "near_dup", iid(s), "phash"))
        keys.append((pid(d), epoch, "near_dup", iid(d), "phash"))
    # referential: orphan captions (no partition → -1), missing captions,
    # caption mismatches (attributed to the image row's partition)
    for k in range(plan.n_orphans):
        keys.append((-1, epoch, "referential", f"orphan-{epoch}-{k}", "image_id"))
    for i in plan.caption_missing:
        keys.append((pid(i), epoch, "referential", iid(i), "caption"))
    for i in plan.caption_mismatch:
        keys.append((pid(i), epoch, "referential", iid(i), "caption"))
    return sorted(keys)
