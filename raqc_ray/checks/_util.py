"""Shared helpers for shuffle-check outputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def empty_violations_df() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "partition_id": pd.Series(dtype="int64"),
            "epoch": pd.Series(dtype="object"),
            "check": pd.Series(dtype="object"),
            "image_id": pd.Series(dtype="object"),
            "column": pd.Series(dtype="object"),
            "detail": pd.Series(dtype="object"),
            "severity": pd.Series(dtype="object"),
        }
    )


def violations_dataset(df: pd.DataFrame):
    """Wrap a violation-sized DataFrame as a Dataset, stashing the frame
    on the object so the pipeline can recover it WITHOUT another Ray
    execution (stream_df) — checks stay Dataset-valued at the API, the
    epoch assembly pays zero extra executor round-trips."""
    import ray.data as rd

    ds = rd.from_pandas(df)
    ds._raqc_df = df
    return ds


def stream_df(ds) -> pd.DataFrame:
    """The violation frame behind a check's Dataset: the stashed pandas
    when present (no execution), else a collect."""
    df = getattr(ds, "_raqc_df", None)
    return df if df is not None else ds.to_pandas()


class TablePartials:
    """In-memory phase-1 partials: an ObjectRef to ONE pyarrow table plus
    its row count.  Produced by the fused pre-pass when the whole partial
    stream is small (validate.py::_fused_views): splitting the fused
    materialized table ONCE in a remote task replaces three
    ``mat.filter(...)`` Dataset executions + three ``decide_path``
    materializations per epoch — each a full streaming-executor run whose
    driver-side scheduling loop is the measured benchxl scaling floor
    (~28 s of driver CPU at 32 CPUs).  Checks accept it anywhere
    ``partials_ds`` is accepted; ``decide_path`` routes it to the
    single-task (small) branch by construction."""

    __slots__ = ("ref", "n")

    def __init__(self, ref, n: int):
        self.ref = ref
        self.n = int(n)


def decide_path(partials_ds, driver_threshold: int):
    """Materialize a partials Dataset and pick the reduction path by SIZE.

    Returns ``(materialized_ds, n_rows, distributed)``.  The single-task
    reduce (``collect_and_reduce``) concatenates every partial block into
    one Ray task — fine while partials are small, an OOM at 10^12-row
    scale — so above ``driver_threshold`` materialized partial rows the
    caller must branch to its distributed groupby-aggregate path.
    ``count()`` on a materialized Dataset is metadata-only (no extra pass).

    ``RAQC_DISTRIBUTED_SCAN`` stays as an override: any truthy value
    forces the distributed path, ``0``/``false`` forces single-task.
    """
    import os as _os

    if isinstance(partials_ds, TablePartials):
        # pre-split in-memory partials: small by construction (the fused
        # pre-pass only builds them under the split threshold)
        return partials_ds, partials_ds.n, False
    mat = partials_ds.materialize()
    n = mat.count()
    env = _os.environ.get("RAQC_DISTRIBUTED_SCAN")
    if env:
        return mat, n, env.lower() not in ("0", "false")
    return mat, n, n > driver_threshold


def collect_and_reduce(ds, reduce_fn, *args):
    """Collect a Dataset's blocks and run ``reduce_fn(table, *args)`` in a
    SINGLE Ray task instead of on the driver.

    Why: every driver-side reduction (sketch merges, segment reduces,
    candidate scans) holds the GIL — with two epochs running in driver
    threads, those sections serialize and become the scaling floor.  One
    remote task per reduction keeps the driver free; blocks reach the
    task zero-copy through the object store.  ``reduce_fn`` receives one
    concatenated arrow table (or None when the dataset is empty) and its
    (small) return value ships back.  Accepts :class:`TablePartials`
    (already one in-store table) as well as a Dataset."""
    import ray

    if isinstance(ds, TablePartials):
        @ray.remote(num_cpus=1)
        def _run_tbl(tbl, *a):
            return reduce_fn(tbl if tbl.num_rows > 0 else None, *a)

        return ray.get(_run_tbl.remote(ds.ref, *args))

    refs = ds.to_arrow_refs()

    @ray.remote(num_cpus=1)
    def _run(tables, *a):
        import ray as _ray

        tables = _ray.get(list(tables))  # a list arg keeps refs unresolved
        live = [t for t in tables if t.num_rows > 0]
        tbl = pa.concat_tables(live) if live else None
        return reduce_fn(tbl, *a)

    return ray.get(_run.remote(refs, *args))


def collect_and_reduce_sliced(ds, reduce_fn, nslices: int, *args) -> list:
    """K-way parallel variant of collect_and_reduce: block refs are
    striped into ``nslices`` groups, each reduced in its own Ray task;
    the caller combines the K (small) results.  Use when the reduce does
    real CPU work (sketch merges) that one task would serialize."""
    import ray

    refs = ds.to_arrow_refs()
    k = max(1, min(nslices, len(refs)))

    @ray.remote(num_cpus=1)
    def _run(tables, *a):
        import ray as _ray

        tables = _ray.get(list(tables))
        live = [t for t in tables if t.num_rows > 0]
        tbl = pa.concat_tables(live) if live else None
        return reduce_fn(tbl, *a)

    return ray.get([_run.remote(refs[i::k], *args) for i in range(k)])


def map_blocks_collect(ds, fn, max_tasks: int = 1024):
    """Apply ``fn(block_table) -> pa.Table`` over a Dataset's blocks as
    PLAIN Ray tasks and return the concatenated result (or None when
    empty).

    Why: a ``map_batches(...).to_pandas()`` phase-2 scan is a full
    streaming-executor run; its driver-side scheduling loop was the
    measured benchxl 32-CPU scaling floor.  For an already-materialized
    narrow projection, direct per-block tasks cost the driver only the
    submissions.  Raw tasks have no streaming backpressure, so above
    ``max_tasks`` blocks (10^12-row scale) this falls back to the
    map_batches execution — outputs there are candidate-sized either
    way."""
    import ray

    refs = ds.to_arrow_refs()
    if len(refs) <= max_tasks:
        @ray.remote(num_cpus=1)
        def _blk(tbl):
            return fn(tbl)

        outs = ray.get([_blk.remote(r) for r in refs])
    else:
        outs = ray.get(
            ds.map_batches(fn, batch_format="pyarrow").to_arrow_refs())
    live = [t for t in outs if t is not None and t.num_rows > 0]
    if live:
        return pa.concat_tables(live)
    return outs[0] if outs else None


def grouped_counts(partials_ds, key_cols: list[str], n_col: str = "n",
                   min_total: int | None = None,
                   driver_threshold: int = 2_000_000) -> pd.DataFrame:
    """Sum per-batch partial counts per key → pandas DataFrame.

    Below ``driver_threshold`` partial rows, a single-task pandas/numpy
    groupby beats a distributed aggregate by an order of magnitude (a Ray
    groupby's fixed per-block scheduling dominates at these sizes); above
    it, a width-bounded distributed aggregate runs and only the (assumed
    small) filtered result is collected.  The branch is taken
    automatically from the materialized partial row count
    (``decide_path``); ``RAQC_DISTRIBUTED_SCAN`` overrides.
    """
    partials_ds, _n, distributed = decide_path(partials_ds, driver_threshold)
    if not distributed:
        kc, nc, mt = list(key_cols), n_col, min_total

        def _reduce(tbl):
            """Sum partials per key in a Ray task (off the driver GIL)."""
            if tbl is None:
                return pd.DataFrame({c: [] for c in kc + [nc]})
            df = tbl.to_pandas()
            if len(kc) == 1 and pd.api.types.is_integer_dtype(df[kc[0]]):
                # numpy fast path: sort + bincount (C), ~10× a pandas groupby
                k = df[kc[0]].to_numpy()
                n = df[nc].to_numpy()
                uniq, inv = np.unique(k, return_inverse=True)
                totals = np.bincount(inv, weights=n).astype(np.int64)
                o = pd.DataFrame({kc[0]: uniq, nc: totals})
            else:
                o = df.groupby(kc, sort=False)[nc].sum().reset_index()
            if mt is not None:
                o = o[o[nc] >= mt]
            return o.reset_index(drop=True)

        return collect_and_reduce(partials_ds, _reduce)
    else:
        from ray.data.aggregate import Sum

        from raqc_ray.pipelines.validate import shuffle_width

        agg = (
            partials_ds.repartition(shuffle_width())
            .groupby(key_cols if len(key_cols) > 1 else key_cols[0])
            .aggregate(Sum(n_col, alias_name=n_col))
        )
        if min_total is not None:
            agg = agg.filter(expr=f"{n_col} >= {min_total}")
        out = agg.to_pandas()
        if len(out) == 0 or n_col not in out.columns:
            return pd.DataFrame({c: [] for c in key_cols + [n_col]})
    if min_total is not None:
        out = out[out[n_col] >= min_total]
    return out.reset_index(drop=True)
