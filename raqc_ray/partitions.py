"""Partition-id attribution.

The fixture layout writes one parquet file per partition named
``part-{pid:05d}.parquet`` (FIXTURES.md §1) — the Lance-fragment stand-in.
``partition_from`` modes:

- ``("path", regex)`` — parse the id from the file path (requires
  ``read_parquet(..., include_paths=True)``); the per-batch cost is one
  regex per *unique* path, not per row.
- ``("column", name)`` — an explicit int64 column.
- ``("expr", fn)``     — computed from the batch (e.g. ``doc_id % 16`` for
  tables without physical partitioning).
- ``("none",)``        — single partition 0.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def make_pid_fn(partition_from: tuple):
    mode = partition_from[0]
    if mode == "path":
        rx = re.compile(partition_from[1])

        def pid_fn(batch: pa.Table) -> np.ndarray:
            paths = batch["path"].to_pylist()
            lut: dict[str, int] = {}
            out = np.empty(len(paths), dtype=np.int64)
            for i, p in enumerate(paths):
                v = lut.get(p)
                if v is None:
                    m = rx.search(p)
                    v = int(m.group(1)) if m else 0
                    lut[p] = v
                out[i] = v
            return out

        return pid_fn
    if mode == "column":
        col = partition_from[1]

        def pid_fn(batch: pa.Table) -> np.ndarray:
            return batch[col].to_numpy(zero_copy_only=False).astype(np.int64)

        return pid_fn
    if mode == "expr":
        fn = partition_from[1]

        def pid_fn(batch: pa.Table) -> np.ndarray:
            return np.asarray(fn(batch), dtype=np.int64)

        return pid_fn
    if mode == "path_fn":
        # like "expr" but the callable needs the ``path`` column (the
        # reader must include paths) — used by the fused epoch-pair
        # Pass A to derive (epoch, partition) from the file path
        fn = partition_from[1]

        def pid_fn(batch: pa.Table) -> np.ndarray:
            return np.asarray(fn(batch), dtype=np.int64)

        return pid_fn

    def pid_fn(batch: pa.Table) -> np.ndarray:
        return np.zeros(batch.num_rows, dtype=np.int64)

    return pid_fn
