"""Dihedral-canonical perceptual hash — rotation/flip-invariant
duplicate detection from decoded pixels.

A training corpus routinely contains the SAME image re-ingested under
trivial augmentations: 90°/180°/270° rotations and mirror flips (the
dihedral group D4).  A plain dHash/pHash keys each orientation
differently, so orientation dups sail through near-dup banding.  The
canonical hash closes the orbit: hash every one of the 8 dihedral
transforms of the decoded array and keep the MINIMUM.  Because the
orbit of any transform of an image IS the image's orbit (group
closure), two images related by any D4 element get the exact same
canonical key — no Hamming tolerance needed, the grouping is an
EXACT-key groupby (dedup accounting precision), while plain
near-pixel edits still ride the existing banded Hamming machinery.

Stateful actor-pool stage (ST4 shape, `DHashStage` sibling):
zero-copy Arrow byte slices, one decode per row, 8 vectorized dHash
evaluations on numpy views (`np.rot90` / reversed-stride flips —
no pixel copies beyond the contiguity pass inside the hash), per-row
``ok=false`` degradation.  Cluster census downstream is ONE
``groupby(canon)`` with native Count/Min/Max aggregates — exchange
sized at distinct hashes, payloads never shuffle.

Gates: orbit-invariance property tests (every transform of a random
array maps to the same canonical hash), planted-pair recovery through
re-encode, and the end-to-end driver oracle `q202` — deterministic
asymmetric renders whose odd ids are dihedral transforms of the even
base, pushed through the REAL decode path vs a closed-form pairing
oracle in SQL.

RAQC analog: none; §2 LLM-pipeline surface (augmentation-closure
dedup).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image, dhash64

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("canon", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


def dihedral_canonical64(arr: np.ndarray) -> int:
    """Minimum dHash over the 8 dihedral transforms of one decoded
    (h, w, 3) uint8 image — identical for every D4-related variant."""
    best = None
    for k in range(4):
        r = np.rot90(arr, k)
        for t in (r, r[:, ::-1]):
            h = dhash64(np.ascontiguousarray(t))
            if best is None or h < best:
                best = h
    return int(best)


class DihedralHashStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        out = {"image_id": ids, "canon": [], "ok": [], "error": []}
        for i, fmt in enumerate(fmts):
            try:
                img = decode_image(row_bytes(i), fmt)
                out["canon"].append(dihedral_canonical64(img))
                out["ok"].append(True)
                out["error"].append(None)
            except (DecodeError, TypeError, ValueError) as e:
                out["canon"].append(0)
                out["ok"].append(False)
                out["error"].append(str(e))
        return pa.table(out, schema=_SCHEMA)


def dihedral_dup_clusters(ds, batch_size: int = 64, concurrency=2,
                          bytes_col: str = "bytes", fmt_col: str = "fmt",
                          id_col: str = "image_id"):
    """Dataset ``(id_min, id_max, n_members)`` — one row per
    canonical-hash cluster with ≥ 2 members (orientation-duplicate
    groups).  ``id_min``/``id_max`` are the lexical extremes of the
    member ids (zero-pad ids upstream for numeric order)."""
    from ray.data.aggregate import Count, Max, Min

    hashes = ds.map_batches(
        DihedralHashStage(bytes_col, fmt_col, id_col),
        batch_size=batch_size, concurrency=concurrency,
        batch_format="pyarrow",
    )
    return (hashes.filter(expr="ok")
            .groupby("canon")
            .aggregate(Count(alias_name="n_members"),
                       Min("image_id", alias_name="id_min"),
                       Max("image_id", alias_name="id_max"))
            .filter(expr="n_members >= 2")
            .select_columns(["id_min", "id_max", "n_members"]))
