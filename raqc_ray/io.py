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

# Ray's path resolver does `from fsspec.implementations.http import
# HTTPFileSystem` on EVERY read; with aiohttp absent the import fails,
# is retried on every call (failed modules aren't cached), and two
# threads racing through it turn the benign ModuleNotFoundError into an
# uncaught partial-import ImportError.  fsspec's http module only needs
# aiohttp/yarl *attributes at runtime* (never reached for local paths),
# so seeding empty module stubs makes the import succeed once, get
# cached, and disappear from the profile.  If warming fails, fall back
# to serializing Dataset creation with a lock.
def _warm_fsspec_http() -> bool:
    import importlib
    import sys
    import types

    try:
        importlib.import_module("fsspec.implementations.http")
        return True
    except ImportError:
        pass
    for name in ("aiohttp", "yarl"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
    try:
        importlib.import_module("fsspec.implementations.http")
        return True
    except Exception:
        return False


_FSSPEC_WARM = _warm_fsspec_http()
_READ_LOCK = threading.Lock()


def read_table(paths, columns=None, include_paths: bool = False,
               num_blocks: int | None = None):
    """Read the table under validation as a ray.data.Dataset.

    ``num_blocks`` bounds read parallelism — narrow passes use it so the
    downstream shuffle width tracks cluster size instead of file count
    (thousands of tiny blocks drown the scheduler; SURVEY.md §4.2)."""
    import ray.data as rd

    import contextlib

    lock = contextlib.nullcontext() if _FSSPEC_WARM else _READ_LOCK
    with lock:
        if HAVE_LANCE and isinstance(paths, str) and paths.endswith(".lance"):
            return rd.read_lance(paths, columns=list(columns) if columns else None)
        kwargs = {}
        if num_blocks is not None:
            kwargs["override_num_blocks"] = num_blocks
        # row-oriented interchange formats (ingest adapters): these
        # cannot prune columns at the read the way parquet/lance do —
        # select immediately after so nothing wider than needed flows
        # downstream (the reader contract S1/S4 shares)
        if isinstance(paths, str) and paths.endswith((".jsonl", ".json")):
            ds = rd.read_json(paths, **kwargs)
            return ds.select_columns(list(columns)) if columns else ds
        if isinstance(paths, str) and paths.endswith(".csv"):
            ds = rd.read_csv(paths, **kwargs)
            return ds.select_columns(list(columns)) if columns else ds
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
