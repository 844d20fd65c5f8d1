"""Perceptual-hash computation from DECODED pixels — the stage that
turns raw image bytes into near-dup keys when the source table ships
no precomputed phash.

Stateful actor-pool stage (SURVEY §2.3 ST4 shape): codecs bind once
per actor in ``__init__``; ``__call__`` slices each row's bytes
zero-copy off the Arrow binary buffer (``arrow_util
.binary_row_accessor`` — no ``to_pylist`` of payloads), decodes with
the repo's own codecs, and emits ``(image_id, dhash, ok, error)``.
Undecodable rows degrade to ``ok=false`` rows instead of poisoning
the batch — the same per-row error contract as ``DecodeCheck``.

Downstream the int64 hash column feeds the existing banded machinery
(:func:`raqc_ray.ops.concomp.hamming_pairs` /
:func:`raqc_ray.checks.neardup.neardup_violations`) unchanged — the
full bytes→hash→candidate-pairs corpus-dedup path with no external
image library.

Gates (no SQL oracle — pixel payloads): ``test_imagehash`` proves
re-encode invariance (PPM↔PNG), uniform-brightness invariance (the
dHash property), planted-near-dup recovery through
``hamming_pairs``, and layout invariance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image, dhash64

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("dhash", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


class DHashStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        self.bytes_col, self.fmt_col, self.id_col = (
            bytes_col, fmt_col, id_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        out = {"image_id": ids, "dhash": [], "ok": [], "error": []}
        for i, fmt in enumerate(fmts):
            try:
                img = decode_image(row_bytes(i), fmt)
                out["dhash"].append(dhash64(img))
                out["ok"].append(True)
                out["error"].append(None)
            except (DecodeError, TypeError) as e:
                out["dhash"].append(0)
                out["ok"].append(False)
                out["error"].append(str(e))
        return pa.table(out, schema=_SCHEMA)


def compute_dhash(ds, batch_size: int = 64, concurrency=2,
                  bytes_col: str = "bytes", fmt_col: str = "fmt",
                  id_col: str = "image_id"):
    """(image_id, dhash, ok, error) for every input row; decode work
    runs in a sized actor pool (small batches — payload columns are
    large)."""
    return ds.map_batches(
        DHashStage(bytes_col=bytes_col, fmt_col=fmt_col, id_col=id_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
