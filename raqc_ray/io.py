"""TableIO seam — Lance when available, parquet stand-in otherwise.

The binding input format is a Lance table of image+caption pairs
(BASELINE.json:15).  This sandbox has no ``lance``/``lancedb`` wheel, so
the engine reads/writes parquet with the SAME Arrow schema; this module is
the single switch point (SURVEY.md §7): when ``lance`` is importable,
``read_table`` uses ``ray.data.read_lance`` and fragment ids become the
partition ids.
"""

from __future__ import annotations

import threading

try:  # pragma: no cover - lance absent in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False

# Dataset *creation* (path/filesystem resolution) is serialized: ray's
# resolver does `from fsspec.implementations.http import HTTPFileSystem`
# per read; when that import fails (no aiohttp here) two threads racing
# through it turn the benign ModuleNotFoundError into an uncaught partial-
# import ImportError. Execution stays fully parallel — only the lazy
# read-plan construction takes the lock.
_READ_LOCK = threading.Lock()


def read_table(paths, columns=None, include_paths: bool = False,
               num_blocks: int | None = None):
    """Read the table under validation as a ray.data.Dataset.

    ``num_blocks`` bounds read parallelism — narrow passes use it so the
    downstream shuffle width tracks cluster size instead of file count
    (thousands of tiny blocks drown the scheduler; SURVEY.md §4.2)."""
    import ray.data as rd

    with _READ_LOCK:
        if HAVE_LANCE and isinstance(paths, str) and paths.endswith(".lance"):
            return rd.read_lance(paths, columns=list(columns) if columns else None)
        kwargs = {}
        if num_blocks is not None:
            kwargs["override_num_blocks"] = num_blocks
        return rd.read_parquet(paths, columns=list(columns) if columns else None,
                               include_paths=include_paths, **kwargs)


def write_outputs(result, out_dir: str) -> dict:
    """Persist a validation result in the resumable layout: partitioned
    violations parquet + a single verdicts parquet + metrics JSON."""
    import json
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    result.violations.write_parquet(os.path.join(out_dir, "violations"))
    pq.write_table(result.verdicts, os.path.join(out_dir, "verdicts.parquet"))
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(result.metrics, f, indent=2, default=str)
    return {"out_dir": out_dir, **result.metrics}
