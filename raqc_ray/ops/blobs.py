"""Per-image connected-component BLOB census — the region-structure
screen the stripe/border/tile ops can't see: solid overlay boxes,
watermark patches, stamped logos, multi-region composites and
fully-vignetted frames all show up as the count and size of
4-connected foreground components of a luma threshold mask.

Per image (decoded ``(h, w, 3)`` uint8), with foreground defined as
``R + G + B > thresh3`` (an exact integer predicate on the 0..765
3-channel sum — no float luma, so the mask is bit-deterministic):

- ``fg_px``       foreground pixel count
- ``n_blobs``     number of 4-connected foreground components
- ``max_blob_px`` size of the largest component (0 when none)
- ``n_runs``      horizontal foreground run count (RLE size — the
                  compressed complexity of the mask; a cheap texture
                  proxy: ``n_runs >> n_blobs`` means ragged regions)

Algorithm — run-based two-pass connected-component labeling (the
classic RLE union-find CCL, e.g. He et al., "Fast connected-component
labeling", Pattern Recognition 2009 — public knowledge):

1. Row-wise run-length encoding of the mask in ONE vectorized numpy
   pass over the whole image (``np.diff`` on the flattened padded
   mask; no per-pixel Python).
2. Union-find over RUNS (not pixels): runs in adjacent rows are
   unioned iff their column intervals overlap.  The overlap set per
   run is a contiguous slice of the (start-sorted) previous row's
   runs, found with two ``np.searchsorted`` calls per row — the
   Python loop is over IMAGE ROWS (h iterations of small numpy work)
   and total union operations are bounded by the number of adjacent
   overlapping run pairs, itself O(runs).  Spiral / U-shaped /
   comb-shaped regions that defeat naive row counting are handled
   exactly (gated against a brute-force BFS reference).
3. Component sizes = run lengths summed by union-find root
   (``np.add.at``).

Scale shape: embarrassingly parallel per image — stateful actor-pool
stage (SURVEY §2.3 ST4, `StripeStage` sibling), no shuffle,
decode-bound; undecodable rows degrade to ``ok=false`` rows.

Gates: brute-force BFS equivalence on adversarial masks (spiral,
comb, checkerboard, random grids — `test_ops_round4w`) and the
end-to-end driver oracle `q194_blob_census_documents` —
deterministic multi-square renders (including corner-touching pairs
that 4-connectivity must NOT merge and U-shapes that row counting
would double-count) through the REAL decode path vs the closed form.

RAQC analog: none (SURVEY §2 image-QA surface — the region-level
complement of the scanline q186 / border q172 / tile q193 family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image

__all__ = ["blob_stats_of", "BlobStage", "blob_census"]

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("fg_px", pa.int64()),
    pa.field("n_blobs", pa.int64()),
    pa.field("max_blob_px", pa.int64()),
    pa.field("n_runs", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


def _find(parent: np.ndarray, i: int) -> int:
    # path-halving find; parent is a small int64 array over RUNS
    while parent[i] != i:
        parent[i] = parent[parent[i]]
        i = parent[i]
    return int(i)


def blob_stats_of(arr: np.ndarray, thresh3: int = 381
                  ) -> tuple[int, int, int, int]:
    """``(fg_px, n_blobs, max_blob_px, n_runs)`` of one decoded image
    under the exact integer foreground predicate ``R+G+B > thresh3``."""
    if arr.size == 0:
        return 0, 0, 0, 0
    h, w = int(arr.shape[0]), int(arr.shape[1])
    mask = arr.astype(np.int32).sum(axis=2) > thresh3
    fg_px = int(mask.sum())
    if fg_px == 0:
        return 0, 0, 0, 0

    # 1. vectorized RLE: pad each row with a False column so runs
    # never straddle a row boundary in the flattened view
    padded = np.zeros((h, w + 1), dtype=bool)
    padded[:, :w] = mask
    flat = padded.ravel()
    d = np.diff(flat.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1          # first fg index
    ends = np.flatnonzero(d == -1) + 1           # one past last fg
    if flat[0]:
        starts = np.concatenate(([0], starts))
    # padding guarantees the last element is False → ends covers all
    row_of = starts // (w + 1)
    s_col = starts % (w + 1)
    e_col = ends - row_of * (w + 1)              # exclusive end col
    lengths = ends - starts
    n_runs = len(starts)

    # 2. union-find over runs; runs are already sorted by (row, col)
    parent = np.arange(n_runs, dtype=np.int64)
    row_break = np.flatnonzero(np.diff(row_of)) + 1
    row_start = np.concatenate(([0], row_break))
    row_end = np.concatenate((row_break, [n_runs]))
    rows_present = row_of[row_start]
    for k in range(1, len(rows_present)):
        if rows_present[k] != rows_present[k - 1] + 1:
            continue                              # gap row: no contact
        a0, a1 = int(row_start[k]), int(row_end[k])
        p0, p1 = int(row_start[k - 1]), int(row_end[k - 1])
        prev_s, prev_e = s_col[p0:p1], e_col[p0:p1]
        # run a overlaps prev run b iff s_b < e_a and s_a < e_b
        lo = np.searchsorted(prev_e, s_col[a0:a1], side="right")
        hi = np.searchsorted(prev_s, e_col[a0:a1], side="left")
        for j in range(a1 - a0):
            ra = -1
            for b in range(int(lo[j]), int(hi[j])):
                if ra < 0:
                    ra = _find(parent, a0 + j)
                rb = _find(parent, p0 + b)
                if ra != rb:
                    parent[rb] = ra
    # 3. component sizes by root
    roots = np.empty(n_runs, dtype=np.int64)
    for i in range(n_runs):
        roots[i] = _find(parent, i)
    uniq, inv = np.unique(roots, return_inverse=True)
    sizes = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sizes, inv, lengths)
    return fg_px, int(len(uniq)), int(sizes.max()), int(n_runs)


class BlobStage:
    """Callable class for ``map_batches`` actor pools (ST4 shape)."""

    def __init__(self, thresh3: int = 381, bytes_col: str = "bytes",
                 fmt_col: str = "fmt", id_col: str = "image_id"):
        self.thresh3 = int(thresh3)
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("fg_px", "n_blobs", "max_blob_px", "n_runs",
                "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i, fmt in enumerate(fmts):
            try:
                arr = decode_image(row_bytes(i), fmt)
                row = (*blob_stats_of(arr, self.thresh3), True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (0, 0, 0, 0, False, f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def blob_census(ds, thresh3: int = 381, bytes_col: str = "bytes",
                fmt_col: str = "fmt", id_col: str = "image_id",
                concurrency: int | None = None, batch_size: int = 128):
    """Dataset of ``_SCHEMA`` rows — one blob-census row per image."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        BlobStage(thresh3, bytes_col, fmt_col, id_col), **kwargs)
