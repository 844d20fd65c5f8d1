"""Per-partition checkpoint/lineage manifest (SURVEY.md §4.2).

Generalizes RAQC's resume mechanism — idempotent stage outputs keyed by
deterministic file names, detected on startup
(``[R] raqc/multi_array.py :: __init__ / already_clipped (rec.)``) — to a
directory of atomic per-partition marker files::

    <root>/<epoch>/part-<pid>.json    {checks_hash, run_id, metrics, ...}

Atomicity: markers are written to a temp file then ``os.replace``d — a
marker either exists complete or not at all, so a killed run never leaves
a half-trusted partition.  The marker doubles as the lineage/metrics
record for the partition (BASELINE.json:14).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import time


def _hash_fn_fingerprint() -> str:
    """Fingerprint of the process-wide 64-bit hash function (polars
    ``Series.hash``): checkpointed HLL registers are built from it and it
    is only stable within one interpreter/polars version — a resume after
    a polars upgrade must INVALIDATE old checkpoints, not merge registers
    from two different hash functions (silent cardinality skew)."""
    try:
        import polars as pl

        probe = pl.Series(["raqc", "fingerprint", "0"]).hash(seed=0).to_list()
        return f"polars-{pl.__version__}-{probe[0]:x}{probe[1]:x}{probe[2]:x}"
    except ImportError:  # pragma: no cover - blake2b fallback is versionless
        return "blake2b"


def checks_hash(cfg) -> str:
    """Stable digest of the check configuration + hash-function
    fingerprint — a changed config OR a changed hash function (polars
    upgrade) invalidates prior checkpoints (same idea as RAQC re-clipping
    when extents change)."""
    payload = repr(sorted(repr(c) for c in cfg.checks)) + _hash_fn_fingerprint()
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class CheckpointManifest:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _marker(self, epoch: str, pid: int) -> str:
        return os.path.join(self.root, epoch, f"part-{pid:05d}.json")

    def completed(self, epoch: str, expect_hash: str) -> dict[int, dict]:
        """pid → marker record, for markers matching the config hash."""
        d = os.path.join(self.root, epoch)
        out: dict[int, dict] = {}
        if not os.path.isdir(d):
            return out
        for f in os.listdir(d):
            if not (f.startswith("part-") and f.endswith(".json")):
                continue
            try:
                with open(os.path.join(d, f)) as fh:
                    rec = json.load(fh)
            except (json.JSONDecodeError, OSError):
                continue  # torn marker (shouldn't happen: atomic rename)
            if rec.get("checks_hash") == expect_hash:
                out[int(rec["partition_id"])] = rec
        return out

    def mark_complete(self, epoch: str, pid: int, cfg_hash: str, run_id: str,
                      metrics: dict | None = None) -> None:
        d = os.path.join(self.root, epoch)
        os.makedirs(d, exist_ok=True)
        rec = {
            "partition_id": pid,
            "epoch": epoch,
            "checks_hash": cfg_hash,
            "run_id": run_id,
            "completed_at": time.time(),
            "metrics": metrics or {},
        }
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(rec, fh)
            os.replace(tmp, self._marker(epoch, pid))  # atomic
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
