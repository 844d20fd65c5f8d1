"""Within-image duplicate-TILE census — the copy-paste / synthetic-
content screen for a curated image corpus: images assembled by
tiling, sprite sheets, screenshot grids, or copy-move edits carry
many byte-identical fixed-size tiles, and collapsed generators emit
near-constant frames (every tile flat).  One decode pass yields
exact integer evidence for all of it::

    dup_tiles  > 0          copy-move / tiled-content signal
    max_mult   ~ n_tiles    one tile stamped everywhere (collapse)
    flat_tiles == n_tiles   constant / letterbox-only frame

Tile identity is EXACT BYTE EQUALITY — tiles are compared as opaque
``tile*tile*3``-byte rows via ``np.unique`` over a void view (no
hash, no collision caveat), so every output is layout-deterministic
and SQL-oracle-able from a closed-form render.  Only complete tiles
count (``floor(h/tile) * floor(w/tile)``; the partial right/bottom
margin is excluded — documented, matches the oracle's closed form).

Vectorized: ONE reshape/swapaxes to a (n_tiles, bytes) matrix, one
``np.unique(return_counts)``, one flatness mask — no per-tile Python.
Stateful actor-pool stage (ST4 shape, `ChannelStatsStage` sibling);
undecodable rows degrade to ``ok=false``.

Gates: planted closed-form unit tests (collision-forcing grids,
partial-margin shapes, all-flat frames) and the END-TO-END driver
oracle `q193_tilecensus_documents` — 4x4 tile-grid renders with
modular tile values (collisions guaranteed) and per-tile
flat/gradient switching through the REAL decode path vs the closed
form.

RAQC analog: none (SURVEY §2 image-axis surface — the within-image
complement of the cross-image q30 phash / q177 tile-change ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image

_INT_COLS = ("n_tiles", "distinct_tiles", "dup_tiles", "max_mult",
             "flat_tiles")

_SCHEMA = pa.schema(
    [pa.field("image_id", pa.string())]
    + [pa.field(c, pa.int64()) for c in _INT_COLS]
    + [pa.field("ok", pa.bool_()), pa.field("error", pa.string())])


def tile_census_of(arr: np.ndarray, tile: int = 8) -> tuple[int, ...]:
    """Exact tile census of one decoded (h, w, 3) uint8 image:
    ``(n_tiles, distinct_tiles, dup_tiles, max_mult, flat_tiles)``
    over complete ``tile x tile`` tiles; ``dup_tiles`` counts tiles
    belonging to a multiplicity->=2 byte-identical group."""
    h, w = arr.shape[0], arr.shape[1]
    th, tw = h // tile, w // tile
    n = th * tw
    if n == 0:
        return (0, 0, 0, 0, 0)
    t = (np.ascontiguousarray(arr[: th * tile, : tw * tile])
         .reshape(th, tile, tw, tile, 3)
         .swapaxes(1, 2)
         .reshape(n, tile * tile * 3))
    flat = int((t == t[:, :1]).all(axis=1).sum())
    v = np.ascontiguousarray(t).view(
        np.dtype((np.void, t.shape[1]))).ravel()
    _, counts = np.unique(v, return_counts=True)
    dup = int(counts[counts > 1].sum())
    return (n, int(len(counts)), dup, int(counts.max()), flat)


class TileCensusStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, tile: int = 8, bytes_col: str = "bytes",
                 fmt_col: str = "fmt", id_col: str = "image_id"):
        self.tile = tile
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = _INT_COLS + ("ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i, fmt in enumerate(fmts):
            try:
                arr = decode_image(row_bytes(i), fmt)
                row = (*tile_census_of(arr, self.tile), True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (*([0] * len(_INT_COLS)), False,
                       f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def tile_census(ds, tile: int = 8, bytes_col: str = "bytes",
                fmt_col: str = "fmt", id_col: str = "image_id",
                concurrency: int | None = None, batch_size: int = 128):
    """Dataset of ``_SCHEMA`` rows — one tile census per image."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        TileCensusStage(tile=tile, bytes_col=bytes_col,
                        fmt_col=fmt_col, id_col=id_col), **kwargs)
