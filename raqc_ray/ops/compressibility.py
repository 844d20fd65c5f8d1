"""zlib compressibility — the corpus-hygiene signal behind
repetition screens (Rae et al.'s Gopher filters and the C4/CCNet
lineage gate on it): machine-generated, template, or degenerate
text compresses far below natural prose, so ``compressed_bytes /
raw_bytes`` is a one-number repetition detector that needs no
tokenizer and no model.

Exact integer contract: per document ``(n_bytes, n_comp,
ratio_bp)`` with ``ratio_bp = n_comp * 10000 // n_bytes`` (basis
points, floor) — pure ints, layout-invariant (compression is
per-row; block boundaries cannot change any output).  Empty
documents are excluded (ratio of zero bytes is undefined), the same
domain filter discipline as `ops/benford`.

Shape: stateless ``map_batches`` over UTF-8 payloads; the per-row
``zlib.compress`` call is C-speed codec work — the same per-payload
loop shape as the decode stages (vectorization does not apply to
entropy coding; the batch stays Arrow end-to-end and only
fixed-width integers come out).  DEFLATE output depends only on
(input, level, strategy), not platform word order, so results are
stable across the cluster as long as workers share a zlib build —
the standard container-image assumption, documented here.

No SQL oracle (DuckDB has no DEFLATE); gated by planted
high/low-entropy fixtures, exact recompute equality, and layout
invariance in `test_ops_round4k`.

RAQC analog: none — SURVEY §2 training-data surface (the
codec-level sibling of the repetition n-gram screen q102 and the
type-token ratio q117).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

__all__ = ["compression_signal"]

_SCHEMA_TAIL = [
    ("n_bytes", pa.int64()),
    ("n_comp", pa.int64()),
    ("ratio_bp", pa.int64()),
]


def compression_signal(ds, id_col: str = "doc_id",
                       text_col: str = "text", level: int = 6):
    """Dataset ``(id_col, n_bytes, n_comp, ratio_bp)`` — one row per
    non-empty document."""
    if not (1 <= level <= 9):
        raise ValueError("compression_signal: need 1 <= level <= 9")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        texts = batch[text_col].to_pylist()
        keep, nb, nc = [], [], []
        for i, t in enumerate(texts):
            if not t:
                continue
            raw = t.encode("utf-8")
            keep.append(i)
            nb.append(len(raw))
            nc.append(len(zlib.compress(raw, level)))
        nb = np.asarray(nb, dtype=np.int64)
        nc = np.asarray(nc, dtype=np.int64)
        return pa.table({
            id_col: ids.take(pa.array(keep, pa.int64())),
            "n_bytes": pa.array(nb),
            "n_comp": pa.array(nc),
            "ratio_bp": pa.array(nc * 10000 // nb),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
