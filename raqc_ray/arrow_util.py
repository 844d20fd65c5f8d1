"""Small Arrow helpers shared by the hot per-row paths."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def binary_row_accessor(col):
    """Zero-copy per-row access to a binary column.

    Returns ``fn(i) -> bytes | None``: slices the Arrow value buffer for
    row ``i`` and copies ONLY that row (one image at a time) instead of
    ``to_pylist()``, which materializes every payload in the batch up
    front.  Rows that are null or empty return ``None``.  Falls back to
    ``to_pylist`` for non-binary storage (e.g. extension arrays).
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_large_binary(arr.type):
        odt = np.int64
    elif pa.types.is_binary(arr.type):
        odt = np.int32
    else:
        odt = None
    if odt is None or len(arr) == 0:
        vals = arr.to_pylist()

        def fallback(i: int):
            v = vals[i]
            return v if v else None

        return fallback
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset
                                             + len(arr) + 1]
    data_mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    nulls = pc.is_null(arr).to_numpy(zero_copy_only=False)

    def row(i: int):
        if nulls[i] or offs[i + 1] == offs[i]:
            return None
        return bytes(data_mv[offs[i] : offs[i + 1]])

    return row
