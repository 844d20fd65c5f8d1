"""Brightness-envelope triage from PARTIAL image decode — per-image
luma block-mean statistics computed from JPEG DC coefficients alone
(:mod:`raqc_ray.jpegdc`), the 100-TB screening pass that flags
black/blown-out/low-contrast images WITHOUT materializing a single
full-resolution pixel array.

Stateful actor-pool stage (SURVEY §2.3 ST4 shape, the `DHashStage`
sibling): ``__call__`` slices each row's bytes zero-copy off the
Arrow binary buffer and emits exact-integer stats of the block-mean
grid — per block ``floor(mean*100 + 0.5)`` luma cents, then int64
``(n_blocks, sum_c, min_c, max_c)`` so every downstream aggregate is
layout-deterministic (the integer-cents discipline).  Non-JPEG rows
(ppm/png — codecs with no transform domain) fall back to a full
decode + the same grid over complete 8x8 blocks; undecodable rows
degrade to ``ok=false`` rows, the `DecodeCheck` per-row error
contract.

JPEG edge note: for dimensions not multiple of 8 the DC grid covers
the encoder's padded edge blocks (that is what is in the file); the
fallback path covers complete blocks only.  Screening thresholds do
not care; byte-exact cross-format comparisons should use aligned
dims.

Gates (no SQL oracle — pixel payloads): `test_dcstats` proves the
DC grid equals the full-decode block means within quantization on
planted constants and synthetic images, ppm fallback exactness, the
per-row error contract, and layout invariance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image
from ..jpegdc import decode_jpeg_dc

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("n_blocks", pa.int64()),
    pa.field("sum_c", pa.int64()),
    pa.field("min_c", pa.int64()),
    pa.field("max_c", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])

_LUMA = np.array([0.299, 0.587, 0.114])


def _grid_stats(means: np.ndarray) -> tuple[int, int, int, int]:
    c = np.floor(means.ravel() * 100.0 + 0.5).astype(np.int64)
    return len(c), int(c.sum()), int(c.min()), int(c.max())


def block_means_full(arr: np.ndarray) -> np.ndarray:
    """Luma block-mean grid of decoded (h, w, 3) pixels over complete
    8x8 blocks — the fallback / test-reference path."""
    y = arr.astype(np.float64) @ _LUMA
    nby, nbx = y.shape[0] // 8, y.shape[1] // 8
    if nby == 0 or nbx == 0:
        raise DecodeError("dcstats: image smaller than one block")
    return (y[:nby * 8, :nbx * 8]
            .reshape(nby, 8, nbx, 8).mean(axis=(1, 3)))


class DcStatsStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        out: dict[str, list] = {k: [] for k in
                                ("n_blocks", "sum_c", "min_c",
                                 "max_c", "ok", "error")}
        for i, fmt in enumerate(fmts):
            try:
                if fmt == "jpeg":
                    means = decode_jpeg_dc(bytes(row_bytes(i)))
                else:
                    means = block_means_full(
                        decode_image(row_bytes(i), fmt))
                n, s, lo, hi = _grid_stats(means)
                row = (n, s, lo, hi, True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (0, 0, 0, 0, False, f"{type(e).__name__}: {e}")
            for k, v in zip(("n_blocks", "sum_c", "min_c", "max_c",
                             "ok", "error"), row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def dc_stats(ds, bytes_col: str = "bytes", fmt_col: str = "fmt",
             id_col: str = "image_id", concurrency: int | None = None,
             batch_size: int = 256):
    """Dataset of ``_SCHEMA`` rows — one stats row per image."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        DcStatsStage(bytes_col=bytes_col, fmt_col=fmt_col,
                     id_col=id_col), **kwargs)
