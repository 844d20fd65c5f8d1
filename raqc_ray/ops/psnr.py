"""Cross-epoch pixel-conformance census — the north-star per-row
invariant (decoded-pixel allclose, PSNR ≥ 40 dB for lossy formats)
as a standalone distributed operator over TWO image epochs.

For each image_id present in both epochs, decode both payloads and
compute the EXACT integer sum of squared differences over all
(h, w, channel) samples.  The 40 dB gate is evaluated without any
float::

    PSNR >= 40  ⇔  MSE <= 255² / 10⁴  ⇔  sse * 10000 <= 65025 * n

so ``pass40`` (and any other threshold a caller derives from ``sse`` /
``n_samp``) is layout-deterministic and SQL-oracle-able.  A float
``psnr_db`` convenience column is emitted too (inf-capped at 99.0 for
identical pixels); oracles should gate on the exact columns.

Plan: epoch alignment is ONE ``hash_join`` on image_id (each payload
shuffles once; when the two epochs already share the engine's
partition layout, use the validate pipeline's per-partition zip
instead — this operator is the generic-alignment path), then a
stateful actor-pool stage decodes both sides per row.  Dimension
mismatches and undecodable rows degrade to ``ok=false``.

Gates: planted-array unit tests (`test_ops_round4u`) and the
END-TO-END driver oracle `q189_psnr_documents` — deterministic
two-tone epoch renders through REAL decodes vs the closed form
``sse = 3 * 256 * (g2a - g2b)²``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image

_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("n_samp", pa.int64()),
    pa.field("sse", pa.int64()),
    pa.field("pass40", pa.bool_()),
    pa.field("psnr_db", pa.float64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


def sse_of(a: np.ndarray, b: np.ndarray) -> tuple[int, int]:
    """(n_samp, exact integer SSE) of two equal-shape uint8 arrays."""
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    d = a.astype(np.int64) - b.astype(np.int64)
    return int(d.size), int((d * d).sum())


class PsnrPairStage:
    """Callable class for ``map_batches`` actor pools over joined
    (image_id, bytes_a, fmt_a, bytes_b, fmt_b) rows."""

    def __init__(self, id_col: str = "image_id"):
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        fa = batch["fmt_a"].to_pylist()
        fb = batch["fmt_b"].to_pylist()
        ra = binary_row_accessor(batch["bytes_a"])
        rb = binary_row_accessor(batch["bytes_b"])
        cols = ("n_samp", "sse", "pass40", "psnr_db", "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i in range(len(ids)):
            try:
                a = decode_image(ra(i), fa[i])
                b = decode_image(rb(i), fb[i])
                n, sse = sse_of(a, b)
                pass40 = sse * 10_000 <= 65_025 * n
                psnr = (99.0 if sse == 0 else float(
                    10.0 * np.log10(65025.0 * n / sse)))
                row = (n, sse, pass40, psnr, True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (0, 0, False, 0.0, False,
                       f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"image_id": ids, **out}, schema=_SCHEMA)


def pair_psnr_census(ds_a, ds_b, id_col: str = "image_id",
                     concurrency: int | None = None,
                     batch_size: int = 64):
    """Dataset of ``_SCHEMA`` rows — one conformance row per image_id
    present in BOTH epochs.  Inputs need (id, bytes, fmt) columns."""
    from .join import hash_join

    def tag(ds, suffix):
        return ds.map_batches(
            lambda b, s=suffix: b.rename_columns(
                [c if c == id_col else f"{c}_{s}"
                 for c in b.column_names]),
            batch_format="pyarrow")

    joined = hash_join(tag(ds_a, "a"), tag(ds_b, "b"), on=id_col)
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return joined.map_batches(PsnrPairStage(id_col=id_col), **kwargs)
