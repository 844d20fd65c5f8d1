"""Cross-epoch change LOCALIZATION — the per-image answer to "the
drift check says epoch B moved; *where* inside the repeat images did
it move?".  Mirrors RAQC's core loop (repeat-array difference flags
over spatial bands, SURVEY §2.5 M1/F1) at the per-image level: each
image is cut into a fixed ``gy × gx`` tile grid, each tile reduced to
an exact integer mean-luma numerator, and the two epochs joined per
(image_id, tile) to census tiles whose mean shifted by more than a
threshold.

Two pieces:

- ``tile_means(ds, gy, gx)`` — actor-pool decode stage emitting long
  rows ``(image_id, ty, tx, n_px, sum_c)``: tile luma-cents sums via
  one vectorized ``add.reduceat`` pyramid per image (no Python pixel
  loops).  Exact int64; ragged right/bottom tiles get their true
  pixel counts.
- ``tile_changes(a, b, gy, gx, thr_c)`` — hash-joins the two long
  streams on (image_id, ty, tx) (the engine's distributed
  `ops.join.hash_join`, image_id-partitioned so one image's tiles
  co-locate) and reduces per image to ``(image_id, n_tiles,
  n_changed, max_dc)`` where a tile counts as changed when
  ``|mean_b - mean_a|`` exceeds ``thr_c`` cents.  The mean compare is
  exact cross-multiplied integer arithmetic — ``|sb*na - sa*nb| >
  thr_c*na*nb`` — no float division anywhere.

Scale shape: decode dominates; the join moves ``gy*gx`` small rows
per image (not pixels), keyed by image_id so skew equals epoch-pair
cardinality skew (none — ids are unique per epoch).

Gates: planted unit tests (`test_tilediff`) and the end-to-end driver
oracle `q177_tilediff_documents` — two-tone epoch pairs with a
planted right-half shift vs a closed-form SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image
from .exposure import luma_cents

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("ty", pa.int64()),
    pa.field("tx", pa.int64()),
    pa.field("n_px", pa.int64()),
    pa.field("sum_c", pa.int64()),
])


def tile_sums_of(arr: np.ndarray, gy: int, gx: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """(n_px, sum_c) int64 grids of shape (gy', gx') for one decoded
    image — gy'/gx' are capped at the image dims so every tile is
    non-empty."""
    c = luma_cents(arr)
    h, w = c.shape
    gy, gx = min(gy, h), min(gx, w)
    ye = (np.arange(gy, dtype=np.int64) * h) // gy
    xe = (np.arange(gx, dtype=np.int64) * w) // gx
    rows = np.add.reduceat(c, ye, axis=0)
    sums = np.add.reduceat(rows, xe, axis=1)
    ny = np.diff(np.append(ye, h))
    nx = np.diff(np.append(xe, w))
    return np.outer(ny, nx), sums


class TileMeansStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, gy: int = 4, gx: int = 4,
                 bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        self.gy, self.gx = int(gy), int(gx)
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        out_id: list[str] = []
        tys: list[np.ndarray] = []
        txs: list[np.ndarray] = []
        npx: list[np.ndarray] = []
        sc: list[np.ndarray] = []
        for i, fmt in enumerate(fmts):
            try:
                arr = decode_image(row_bytes(i), fmt)
            except (DecodeError, TypeError, ValueError):
                continue  # undecodable rows are the decode check's job
            n, s = tile_sums_of(arr, self.gy, self.gx)
            g_y, g_x = n.shape
            yy, xx = np.mgrid[0:g_y, 0:g_x]
            out_id.extend([ids[i]] * (g_y * g_x))
            tys.append(yy.ravel().astype(np.int64))
            txs.append(xx.ravel().astype(np.int64))
            npx.append(n.ravel())
            sc.append(s.ravel())
        if not out_id:
            return _SCHEMA.empty_table()
        return pa.Table.from_pydict({
            "image_id": out_id,
            "ty": np.concatenate(tys), "tx": np.concatenate(txs),
            "n_px": np.concatenate(npx), "sum_c": np.concatenate(sc),
        }, schema=_SCHEMA)


def tile_means(ds, gy: int = 4, gx: int = 4,
               bytes_col: str = "bytes", fmt_col: str = "fmt",
               id_col: str = "image_id",
               concurrency: int | None = None, batch_size: int = 128):
    """Dataset of ``_SCHEMA`` long rows — ``gy*gx`` tiles per image."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        TileMeansStage(gy=gy, gx=gx, bytes_col=bytes_col,
                       fmt_col=fmt_col, id_col=id_col), **kwargs)


def tile_changes(tiles_a, tiles_b, thr_c: int, num_partitions: int = 32):
    """Per-image change census between two `tile_means` streams:
    ``(image_id, n_tiles, n_changed, max_dc)``.  ``max_dc`` is the
    max |mean delta| over tiles in FLOOR cents (exact integer floor of
    ``|sb*na - sa*nb| / (na*nb)``); a tile is changed when the true
    |mean delta| strictly exceeds ``thr_c``."""
    from ray.data.aggregate import Max, Sum

    from .join import hash_join

    j = hash_join(tiles_a, tiles_b, on=["image_id", "ty", "tx"],
                  left_suffix="_a", right_suffix="_b",
                  num_partitions=num_partitions)

    def census(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"image_id": pd.Series([], dtype=str),
                                 "one": pd.Series([], dtype=np.int64),
                                 "chg": pd.Series([], dtype=np.int64),
                                 "dc": pd.Series([], dtype=np.int64)})
        na = df["n_px_a"].to_numpy(np.int64)
        nb = df["n_px_b"].to_numpy(np.int64)
        sa = df["sum_c_a"].to_numpy(np.int64)
        sb = df["sum_c_b"].to_numpy(np.int64)
        # object-dtype Python ints: |sb*na - sa*nb| can exceed int64
        # for large tiles x cents; exactness beats vector speed here
        # (rows are tile-sized, not pixel-sized)
        num = np.abs(sb.astype(object) * na - sa.astype(object) * nb)
        den = na.astype(object) * nb
        return pd.DataFrame({
            "image_id": df["image_id"],
            "one": np.ones(len(df), dtype=np.int64),
            "chg": np.fromiter((1 if n > thr_c * d else 0
                                for n, d in zip(num, den)),
                               dtype=np.int64, count=len(df)),
            "dc": np.fromiter((int(n // d) for n, d in zip(num, den)),
                              dtype=np.int64, count=len(df)),
        })

    return (j.map_batches(census, batch_format="pandas")
            .groupby("image_id")
            .aggregate(Sum("one", alias_name="n_tiles"),
                       Sum("chg", alias_name="n_changed"),
                       Max("dc", alias_name="max_dc")))
