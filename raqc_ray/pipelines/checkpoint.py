"""Checkpoint-resumable validation runs (SURVEY.md §3.2 / §4.2).

The expensive stage — Pass A, which decodes every image — is checkpointed
per partition: its output-sized result rows are persisted under::

    <ckpt_root>/passa/<epoch>/part-<pid>.parquet     (atomic tmp+rename)
    <ckpt_root>/manifest/<epoch>/part-<pid>.json     (marker, after data)

A resumed run loads completed partitions' Pass A outputs from the
checkpoint (cheap, narrow) and re-runs Pass A only for missing ones.
Global checks (uniqueness / near-dup / referential / drift) are
cross-partition by nature and re-run each time over narrow columns —
exactly RAQC's split, where the clipped-raster cache resumes the heavy
geometry work and flags recompute from it
(``[R] raqc/multi_array.py :: already_clipped (rec.)``).

Work is chunked (``chunk_partitions`` files per Ray pipeline) so a kill
loses at most one chunk; chunk size trades per-pipeline overhead against
resume granularity at 100-TB scale.
"""

from __future__ import annotations

import os
import re
import tempfile
import uuid

import pyarrow.parquet as pq

import ray as _ray
import ray.data as rd

from ..config import RunConfig
from ..state.manifest import CheckpointManifest, checks_hash
from .validate import EpochResult, run_passa, validate_epoch


def _pid_of_path(path: str, cfg: RunConfig) -> int:
    m = re.search(cfg.partition_from[1], path)
    return int(m.group(1)) if m else 0


@_ray.remote(num_cpus=1)
def _write_chunk(tables, pids: list[int], passa_dir: str) -> dict[int, int]:
    """Concat a chunk's Pass A blocks and write one atomic parquet per
    partition.  Runs as a Ray task — chunk-bounded memory, off the driver."""
    import pyarrow as pa
    import ray

    from ..stages.passa import PASSA_SCHEMA

    tables = ray.get(list(tables))  # list arg keeps refs unresolved until here
    blocks = [t for t in tables if t.num_rows > 0]
    full = (
        pa.concat_tables([t.cast(PASSA_SCHEMA) for t in blocks])
        if blocks
        else PASSA_SCHEMA.empty_table()
    )
    rows: dict[int, int] = {}
    for pid in pids:
        mask = pa.compute.equal(full["partition_id"], pa.scalar(pid, pa.int64()))
        part_tbl = full.filter(mask)
        fd, tmp = tempfile.mkstemp(dir=passa_dir, suffix=".tmp")
        os.close(fd)
        pq.write_table(part_tbl, tmp)
        os.replace(tmp, os.path.join(passa_dir, f"part-{pid:05d}.parquet"))
        rows[pid] = int(part_tbl.num_rows)
    return rows


def validate_epoch_checkpointed(
    part_paths: list[str],
    cfg: RunConfig,
    ckpt_root: str,
    chunk_partitions: int = 8,
    crash_after_chunks: int | None = None,
) -> EpochResult:
    """Validate with per-partition resume.  ``part_paths`` must be the
    one-file-per-partition layout (partition id parsed from the name).

    ``crash_after_chunks`` is a test hook: raise after N chunks complete,
    simulating a killed ``ray job``.
    """
    assert cfg.partition_from[0] == "path", "checkpointed runs key on file paths"
    manifest = CheckpointManifest(os.path.join(ckpt_root, "manifest"))
    cfg_hash = checks_hash(cfg)
    run_id = uuid.uuid4().hex[:12]
    # resolved-config backup next to outputs (RAQC writes its validated
    # .ini beside the flag tiffs — ``[R] raqc/cli.py (rec.)``, SURVEY S7)
    import json

    with open(os.path.join(ckpt_root, f"config-{cfg.epoch}.json"), "w") as f:
        json.dump(
            {"epoch": cfg.epoch, "checks_hash": cfg_hash,
             "batch_size": cfg.batch_size,
             "checks": [repr(c) for c in cfg.checks]},
            f, indent=2,
        )
    passa_dir = os.path.join(ckpt_root, "passa", cfg.epoch)
    os.makedirs(passa_dir, exist_ok=True)

    done = manifest.completed(cfg.epoch, cfg_hash)
    todo = sorted(
        (p for p in part_paths if _pid_of_path(p, cfg) not in done),
        key=lambda p: _pid_of_path(p, cfg),
    )

    chunks = [
        todo[i : i + chunk_partitions] for i in range(0, len(todo), chunk_partitions)
    ]
    for ci, chunk in enumerate(chunks):
        if crash_after_chunks is not None and ci >= crash_after_chunks:
            raise RuntimeError(f"simulated crash after {ci} chunks")
        passa = run_passa(chunk, cfg)
        # Persist per-partition slices atomically INSIDE a Ray task (the
        # driver never touches the data path — VERDICT r1 #9); blocks
        # reach the task zero-copy, only {pid: rows} ships back.  The
        # checkpoint root must be cluster-visible storage (it already
        # must be, for any other node to resume).
        import ray

        chunk_pids = [_pid_of_path(p, cfg) for p in chunk]
        rows_by_pid = ray.get(
            _write_chunk.remote(passa.to_arrow_refs(), chunk_pids, passa_dir)
        )
        for pid in chunk_pids:
            manifest.mark_complete(
                cfg.epoch, pid, cfg_hash, run_id,
                metrics={"rows": rows_by_pid[pid]},
            )

    # All partitions checkpointed → downstream runs on the union of
    # EXACTLY the current run's partitions (done ∪ todo) — a stale
    # checkpoint file from a partition no longer in the input must not be
    # silently unioned in (it would inflate counts and verdicts).
    want = sorted({_pid_of_path(p, cfg) for p in part_paths})
    ckpt_files = [
        os.path.join(passa_dir, f"part-{pid:05d}.parquet") for pid in want
    ]
    missing = [f for f in ckpt_files if not os.path.exists(f)]
    if missing:
        # Explicit raise (not assert): under ``python -O`` an assert is
        # stripped and a missing part file would silently drop a
        # partition from downstream validation.
        raise FileNotFoundError(
            f"checkpoint files missing after compute: {missing}"
        )
    passa_all = rd.read_parquet(ckpt_files).materialize()
    result = validate_epoch(part_paths, cfg, passa=passa_all)
    result.metrics["resumed_partitions"] = sorted(done)
    result.metrics["computed_partitions"] = [
        _pid_of_path(p, cfg) for p in todo
    ]
    result.metrics["run_id"] = run_id
    return result
