"""End-to-end validation pipeline (SURVEY.md §3.4 lifecycle).

Per epoch::

    read parquet (Lance stand-in), include_paths for partition ids
      → map_batches(ValidatorStage)          [actor pool if decoding]
          row checks + decode + stat partials, in-band union output
      → (tiny) groupby(partition, check) merge partials
      → narrow re-reads (columns pruned at the parquet reader — ``bytes``
        never enters a shuffle) for uniqueness / near-dup / referential
      → verdict assembly on the driver (per-partition counts are small)

Across an epoch pair, drift verdicts compare per-partition 2-D histograms
against the baseline epoch (checks/drift.py).

Scale contract: every materialized object here is *output-sized*
(violations, per-partition partials, verdicts), never input-sized — the
fat pass streams with backpressure.  This inverts RAQC's memory model
(whole rasters resident in RAM, ``[R] raqc/multi_array.py (rec.)``) while
computing the same flag families.
"""

from __future__ import annotations

import json
import pickle
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..checks import (
    drift_verdicts,
    neardup_violations,
    referential_violations,
    uniqueness_violations,
)
from ..config import (
    CardinalityCheck,
    DecodeCheck,
    DriftCheck,
    Hist2DCheck,
    NearDupCheck,
    QuantileCheck,
    ReferentialCheck,
    RunConfig,
    StatsCheck,
    UniquenessCheck,
)
from ..partitions import make_pid_fn
from ..schema import VERDICTS_SCHEMA, VIOLATIONS_SCHEMA
from ..sketches import HyperLogLog, TDigest
from ..stages.passa import ROWCOUNT_CHECK, ValidatorStage, merge_payloads

ROW_CHECKS = ("nullity", "range", "caption", "decode", "expr",
              "exposure", "uniqueness", "near_dup", "referential")


@dataclass
class EpochResult:
    epoch: str
    violations: "rd.Dataset"
    verdicts: pa.Table
    merged: dict  # (partition_id, check) -> {"payload": bytes, "n_rows": int}
    metrics: dict = field(default_factory=dict)

    def hists(self) -> dict[int, np.ndarray]:
        return {
            pid: pickle.loads(m["payload"])
            for (pid, check), m in self.merged.items()
            if check == "hist2d"
        }

    def row_counts(self) -> dict[int, int]:
        return {
            pid: pickle.loads(m["payload"])
            for (pid, check), m in self.merged.items()
            if check == ROWCOUNT_CHECK
        }


def shuffle_width() -> int:
    """Target block count for output-sized / narrow datasets: scales with
    the cluster (2× CPUs, clamped) instead of with input file count —
    thousands of near-empty blocks cost ~50 ms of scheduling each on every
    downstream operator."""
    import ray

    total = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(8, min(2 * total, 256))


def _read(paths, cfg: RunConfig, columns=None, bounded: bool = False):
    from ..io import read_table

    include_paths = cfg.partition_from[0] in ("path", "path_fn")
    return read_table(
        paths, columns=columns, include_paths=include_paths,
        num_blocks=shuffle_width() if bounded else None,
    )


def run_passa(paths, cfg: RunConfig):
    """Pass A only: the fat streaming pass → materialized output-sized
    Dataset of in-band violation + partial rows (PASSA_SCHEMA)."""
    decode = cfg.get(DecodeCheck)
    ds = _read(paths, cfg, columns=list(cfg.read_columns) if cfg.read_columns else None)
    if decode is not None:
        conc = cfg.decode_concurrency
        if not conc:
            import ray

            total = (
                int(ray.cluster_resources().get("CPU", 4))
                if ray.is_initialized()
                else 4
            )
            conc = max(1, min(total - 2, (3 * total) // 4))
        passa = ds.map_batches(
            ValidatorStage,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=conc,
        )
    else:
        stage = ValidatorStage(cfg)
        passa = ds.map_batches(stage, batch_format="pyarrow",
                               batch_size=cfg.batch_size)
    # Pass A output is output-sized (violations + per-batch partials) and
    # is consumed exactly ONCE (the split reduce, or the checkpoint
    # writer) — returning the LAZY dataset avoids a repartition barrier +
    # materialize round-trip that used to cost several seconds of
    # CPU-independent residue per epoch.
    return passa


def _merge_partials_table(tbl) -> dict:
    """Reduce the kind="s" partial rows to {(pid, check): {payload, n_rows}}.
    Runs inside a Ray task (checks/_util.collect_and_reduce)."""
    from collections import defaultdict

    merged: dict = {}
    if tbl is None:
        return merged
    groups: dict = defaultdict(list)
    n_rows_acc: dict = defaultdict(int)
    for pid, check, payload, n_rows in zip(
        tbl["partition_id"].to_pylist(), tbl["check"].to_pylist(),
        tbl["payload"].to_pylist(), tbl["n_rows"].to_pylist(),
    ):
        k = (int(pid), check)
        groups[k].append(bytes(payload))
        n_rows_acc[k] += int(n_rows)
    for (pid, check), payloads in groups.items():
        merged[(pid, check)] = {
            "payload": merge_payloads(check, payloads),
            "n_rows": n_rows_acc[(pid, check)],
        }
    return merged


class _StageClock:
    """Wall-time per blocking pipeline section → metrics["stage_sec"].

    The CPU-independent residue of these sections is what caps N→4N
    scaling efficiency; BENCH_r{N}.json carries the dict so regressions
    are visible per round (VERDICT r1 #10)."""

    def __init__(self):
        self.t: dict[str, float] = {}

    def stage(self, name: str):
        import contextlib
        import time as _time

        @contextlib.contextmanager
        def _cm():
            t0 = _time.perf_counter()
            try:
                yield
            finally:
                self.t[name] = round(
                    self.t.get(name, 0.0) + _time.perf_counter() - t0, 3)

        return _cm()


def validate_epoch(paths, cfg: RunConfig, passa=None) -> EpochResult:
    """Run all configured checks on one epoch. ``paths`` = parquet file(s)
    or directory (one file per partition).  ``passa`` may be supplied by a
    checkpointed runner (pipelines/checkpoint.py) to skip the fat pass.

    The fat Pass A and the narrow shuffle checks are INDEPENDENT — they
    run concurrently (driver threads): the narrow checks' internal
    blocking collects overlap with the decode pool's streaming work,
    keeping the serial driver path off the critical path (the serial
    fraction is what caps N→4N scaling efficiency)."""
    from concurrent.futures import ThreadPoolExecutor

    clock = _StageClock()
    pid_fn = make_pid_fn(cfg.partition_from)

    uniq = cfg.get(UniquenessCheck)
    nd = cfg.get(NearDupCheck)
    ref = cfg.get(ReferentialCheck)

    # ONE narrow read plan shared by every shuffle check: building a read
    # costs a per-file metadata scan (~10 ms × files, serial on the
    # driver) — three separate narrow reads per epoch tripled that cost.
    narrow_cols: list[str] = []
    for c in [uniq.column if uniq else None,
              nd.column if nd else None,
              "image_id" if nd else None,
              ref.key if (ref and ref.side_path) else None,
              ref.compare if (ref and ref.side_path) else None]:
        if c and c not in narrow_cols:
            narrow_cols.append(c)
    narrow_plan = (
        _read(paths, cfg, columns=narrow_cols, bounded=True)
        if narrow_cols
        else None
    )

    # Materialize the narrow projection ONCE, in a thread that overlaps
    # Pass A's streaming: uniqueness/near-dup/referential each run 2-3
    # executions over it, and an unmaterialized plan re-reads the parquet
    # every time (measured 4-5 redundant reads/epoch ≈ 8 s at bench
    # scale).  The materialized blocks are (id, phash)-sized — a few % of
    # table bytes; at 10^12 rows they spill to local disk, which is still
    # strictly cheaper than repeated remote-storage column reads.
    def _narrow_mat():
        with clock.stage("narrow_plan"):
            return narrow_plan.materialize()

    def _fused_views(nds):
        """ONE scan computes every shuffle check's phase-1 partials.

        uniqueness / near-dup / referential each used to open their own
        map_batches pass over the narrow projection (3 full scans + 3
        hash passes per epoch, all competing with the decode pool).  The
        fused pass emits each check's partial rows from the same block
        visit, harmonized into one all-int64 table tagged by ``src``, and
        materializes ONCE; each check then consumes a filtered view whose
        execution moves only partial-sized data.  Violations are
        byte-identical — the per-check partial ROWS are unchanged, only
        their transport is shared."""
        from ..io import read_table
        from ..checks.neardup import _bands_for, _phash_bucket_counts
        from ..checks.referential import _int_partials
        from ..checks.uniqueness import _hash_partials

        bands = _bands_for(nd.max_hamming)[0] if nd else None
        COLS = ["src", "khash", "partition_id", "n", "bucket",
                "n_img", "n_cap", "h_img", "h_cap", "pid"]

        def pad(t: pa.Table, src: int) -> pa.Table:
            n = t.num_rows
            cols = {}
            for c in COLS:
                if c == "src":
                    cols[c] = pa.array(np.full(n, src, dtype=np.int64))
                elif c in t.column_names:
                    cols[c] = t[c]
                else:
                    cols[c] = pa.array(np.zeros(n, dtype=np.int64))
            return pa.table(cols)

        def img_side(b: pa.Table) -> pa.Table:
            parts = []
            if uniq is not None:
                parts.append(pad(_hash_partials(b, uniq.column, pid_fn), 0))
            if nd is not None:
                parts.append(pad(_phash_bucket_counts(b, nd, bands), 1))
            if ref is not None and ref.side_path:
                parts.append(pad(_int_partials(b, ref, pid_fn, 0), 2))
            return pa.concat_tables(parts)

        import os as _os

        import ray as _ray

        # Plain per-block Ray tasks over the ALREADY-MATERIALIZED narrow
        # blocks (and the materialized captions), instead of a
        # map_batches→union→materialize Dataset run: a streaming-executor
        # execution costs a driver-side scheduling loop that was the
        # measured 32-CPU scaling floor (~28 s driver CPU per benchxl
        # pair); ~80 direct task submissions cost milliseconds.  Each
        # task returns (partial table, row count); the counts (tiny)
        # decide split-vs-distributed below without another execution.
        cap_ds = None
        if ref is not None and ref.side_path:
            cap_ds = read_table(ref.side_path).materialize()

        @_ray.remote(num_cpus=1, num_returns=2)
        def _img_task(tbl: pa.Table):
            out = img_side(tbl)
            return out, out.num_rows

        @_ray.remote(num_cpus=1, num_returns=2)
        def _cap_task(tbl: pa.Table):
            out = pad(_int_partials(tbl, ref, pid_fn, 1), 2)
            return out, out.num_rows

        pairs = [_img_task.remote(r) for r in nds.to_arrow_refs()]
        if cap_ds is not None:
            pairs += [_cap_task.remote(r) for r in cap_ds.to_arrow_refs()]
        part_refs = [p[0] for p in pairs]
        n_total = int(sum(_ray.get([p[1] for p in pairs])))
        env = _os.environ.get("RAQC_DISTRIBUTED_SCAN")
        force_dist = bool(env) and env.lower() not in ("0", "false")
        if n_total <= cfg.fused_split_threshold and not force_dist:
            # Small partial stream: ONE remote task splits the fused table
            # into the three per-check projections (each an in-store arrow
            # table).  The Dataset alternative — three mat.filter(...)
            # views, each re-materialized by its check's decide_path — is
            # three more full streaming-executor runs; their driver-side
            # scheduling loops were the measured benchxl scaling floor.
            import ray as _ray

            from ..checks._util import TablePartials

            SRC_COLS = {0: ["khash", "partition_id", "n"],
                        1: ["bucket", "n"],
                        2: ["khash", "n_img", "n_cap", "h_img", "h_cap"]}

            @_ray.remote(num_cpus=1, num_returns=3)
            def _split(tables):
                tables = _ray.get(list(tables))
                live = [t for t in tables if t.num_rows > 0]
                if live:
                    tbl = pa.concat_tables(live)
                elif tables:
                    tbl = tables[0].slice(0, 0)
                else:
                    tbl = pa.table({c: pa.array([], pa.int64())
                                    for c in COLS})
                src = tbl["src"].to_numpy(zero_copy_only=False)
                out = []
                for s in (0, 1, 2):
                    part = tbl.filter(pa.array(src == s))
                    out.append(part.select(SRC_COLS[s]))
                return tuple(out)

            u_ref, n_ref, r_ref = _split.remote(part_refs)
            views = {}
            if uniq is not None:
                views["uniq"] = TablePartials(u_ref, n_total)
            if nd is not None:
                views["nd"] = TablePartials(n_ref, n_total)
            if ref is not None and ref.side_path:
                views["ref"] = TablePartials(r_ref, n_total)
            return views, cap_ds
        # 10^12-row path: wrap the partial blocks as a Dataset (no
        # execution — the blocks already live in the object store) and
        # hand each check a filtered view for its distributed aggregation.
        mat = rd.from_arrow_refs(part_refs)
        views = {}
        if uniq is not None:
            views["uniq"] = mat.filter(expr="src == 0")
        if nd is not None:
            views["nd"] = mat.filter(expr="src == 1")
        if ref is not None and ref.side_path:
            views["ref"] = mat.filter(expr="src == 2")
        return views, cap_ds

    def _uniq_stream(nds, part):
        with clock.stage("uniqueness"):
            return uniqueness_violations(nds, uniq.column, cfg.epoch,
                                         pid_fn, uniq.severity,
                                         partials_ds=part)

    def _nd_stream(nds, part):
        with clock.stage("neardup"):
            return neardup_violations(nds, nd, cfg.epoch, pid_fn,
                                      partials_ds=part)

    def _ref_stream(nds, cap_ds, part):
        with clock.stage("referential"):
            return referential_violations(nds, cap_ds, ref, cfg.epoch,
                                          pid_fn, partials_ds=part)

    with ThreadPoolExecutor(max_workers=6) as ex:
        narrow_f = ex.submit(_narrow_mat) if narrow_plan is not None else None
        fused_f = (ex.submit(lambda: _fused_views(narrow_f.result()))
                   if narrow_f is not None
                   and (uniq is not None or nd is not None
                        or (ref is not None and ref.side_path)) else None)
        uniq_f = (ex.submit(lambda: _uniq_stream(
                      narrow_f.result(), fused_f.result()[0].get("uniq")))
                  if uniq is not None else None)
        nd_f = (ex.submit(lambda: _nd_stream(
                    narrow_f.result(), fused_f.result()[0].get("nd")))
                if nd is not None else None)
        ref_f = (ex.submit(lambda: _ref_stream(
                     narrow_f.result(), fused_f.result()[1],
                     fused_f.result()[0].get("ref")))
                 if (ref is not None and ref.side_path) else None)
        if passa is None:
            with clock.stage("passa"):
                passa = run_passa(paths, cfg)

        # ONE remote reduce task splits Pass A output into merged stat
        # partials AND the in-band violation table (previously two
        # separate filter+collect executions); the driver GIL stays free
        # so the two epochs actually overlap.  The premerge combiner was
        # removed: measured HARMFUL at bench scale (pair 87s->125s).
        from ..checks._util import collect_and_reduce_sliced

        import os as _os

        # passa_exec is where the wall actually goes (the decode actor
        # pool executing the Pass-A lineage); merge_partials is ONLY the
        # partial-stream reduce.  Keeping them as separate ledger keys
        # stops the merge from absorbing the decode time in BENCH stages.
        with clock.stage("passa_exec"):
            if hasattr(passa, "result"):  # fused-pair lazy handle
                passa = passa.result()
            passa = passa.materialize()
        with clock.stage("merge_partials"):
            # Decide the merge path by SIZE (materialized partial-stream
            # rows), like every other check's decide_path: the sliced
            # single-task reduce is fastest while partials are small but
            # concatenates an input-proportional stream at 10^12-row
            # scale.  RAQC_WIDE_PARTIALS stays as an explicit override
            # (1 forces wide, 0 forces sliced).
            env = _os.environ.get("RAQC_WIDE_PARTIALS")
            if env is not None and env != "":
                wide = env.lower() not in ("0", "false")
            else:
                wide = (cfg.wide_partials
                        or passa.count() > cfg.wide_partials_threshold)
            if wide:
                # 10^12-row path: per-block combiner shrinks the partial
                # stream to ≈ one payload per (partition, check) per
                # block, then a distributed groupby/map_groups merge —
                # nothing input-sized ever lands in one task
                merged, passa_vio = _wide_partials_merge(passa, cfg)
            else:
                # K parallel reduce tasks over block slices (the payload
                # merges — t-digest/HLL — are real CPU work at 512
                # partitions); the tiny K-way combine runs on the driver.
                # K scales with the cluster so the post-Pass-A merge tail
                # shrinks with added CPUs instead of capping efficiency.
                import ray as _ray

                nsl = max(4, min(16,
                                 int(_ray.cluster_resources().get("CPU", 8)
                                     // 2)))
                parts = collect_and_reduce_sliced(passa, _split_passa_table,
                                                  nsl)
                merged, passa_vio = _combine_split_parts(parts)
        uniq_stream = uniq_f.result() if uniq_f is not None else None
        nd_stream = nd_f.result() if nd_f is not None else None
        ref_stream = ref_f.result() if ref_f is not None else None

    # ---- violation assembly: all inputs are violation-sized pandas (the
    # reduce task's in-band table + each check's stashed frame) — no
    # further Ray executions run here ------------------------------------
    import time as _time

    from ..checks._util import stream_df

    _t0 = _time.perf_counter()
    frames = [passa_vio]
    for s in (uniq_stream, nd_stream, ref_stream):
        if s is not None:
            df = stream_df(s)
            if len(df):
                frames.append(df[list(VIOLATIONS_SCHEMA.names)])
    vdf = (pd.concat(frames, ignore_index=True) if len(frames) > 1
           else frames[0])
    violations = rd.from_arrow(
        pa.Table.from_pandas(vdf, schema=VIOLATIONS_SCHEMA,
                             preserve_index=False)
    )
    violations._raqc_df = vdf
    n_vio = len(vdf)
    vio_counts = (
        vdf.groupby(["partition_id", "check"], sort=False)
        .size()
        .reset_index(name="count()")
        if n_vio
        else pd.DataFrame({"partition_id": [], "check": [], "count()": []})
    )
    count_lut = {
        (int(r["partition_id"]), r["check"]): int(r["count()"])
        for _, r in vio_counts.iterrows()
    }
    clock.t["violations_assemble"] = round(_time.perf_counter() - _t0, 3)
    with clock.stage("verdicts"):
        # off-driver: verdict assembly loops pids × checks and computes
        # sketch quantiles — 1-2 s of GIL-bound work that would serialize
        # the two concurrent epochs if run on the driver
        import ray as _r

        verdicts = _r.get(_build_verdicts_remote.remote(cfg, merged,
                                                        count_lut))

    metrics = {
        "epoch": cfg.epoch,
        "n_partitions": len({pid for (pid, c) in merged if c == ROWCOUNT_CHECK}),
        "n_rows": sum(
            pickle.loads(m["payload"])
            for (pid, c), m in merged.items()
            if c == ROWCOUNT_CHECK
        ),
        "n_violations": int(sum(count_lut.values())),
        "stage_sec": clock.t,
    }
    return EpochResult(cfg.epoch, violations, verdicts, merged, metrics)


def _wide_partials_merge(passa, cfg: RunConfig):
    """Distributed merge of the kind='s' stream (premerge_block +
    groupby/map_groups — stages/passa.py) and a separate output-sized
    collect of the kind='v' stream.  Semantically identical to the
    sliced single-task reduce; used when the partial stream itself is
    huge — auto-selected by materialized size in run_epoch, or forced
    via RunConfig.wide_partials / RAQC_WIDE_PARTIALS=1."""
    from ..checks._util import empty_violations_df
    from ..stages.passa import merge_partial_group, premerge_block

    mat = passa.materialize()  # no-op if caller already materialized
    part_df = (
        mat.filter(expr="kind == 's'")
        .map_batches(lambda df: premerge_block(df, cfg),
                     batch_format="pandas", batch_size=None)
        .groupby(["partition_id", "epoch", "check"])
        .map_groups(lambda g: merge_partial_group(g, cfg),
                    batch_format="pandas")
        .to_pandas()
    )
    merged = {
        (int(r.partition_id), r.check): {"payload": bytes(r.payload),
                                         "n_rows": int(r.n_rows)}
        for r in part_df.itertuples()
    } if len(part_df) and "check" in part_df.columns else {}
    vdf = mat.filter(expr="kind == 'v'").to_pandas()
    if len(vdf) == 0 or "check" not in vdf.columns:
        vdf = empty_violations_df()
    else:
        vdf = vdf[list(VIOLATIONS_SCHEMA.names)]
    return merged, vdf


def _combine_split_parts(parts):
    """Combine K slices' (merged dict, violations df) into one."""
    from collections import defaultdict

    payloads: dict = defaultdict(list)
    n_rows: dict = defaultdict(int)
    for merged_k, _ in parts:
        for key, m in merged_k.items():
            payloads[key].append(m["payload"])
            n_rows[key] += m["n_rows"]
    merged = {
        key: {"payload": (plist[0] if len(plist) == 1
                          else merge_payloads(key[1], plist)),
              "n_rows": n_rows[key]}
        for key, plist in payloads.items()
    }
    vio = pd.concat([v for _, v in parts], ignore_index=True)
    return merged, vio


def _split_passa_table(tbl):
    """One reduce over Pass A output → (merged partials dict, violations
    DataFrame).  Runs inside a Ray task (collect_and_reduce)."""
    from ..checks._util import empty_violations_df

    if tbl is None:
        return {}, empty_violations_df()
    kinds = tbl["kind"].to_numpy(zero_copy_only=False)
    vmask = kinds == "v"
    vio = tbl.filter(pa.array(vmask)).select(list(VIOLATIONS_SCHEMA.names))
    merged = _merge_partials_table(tbl.filter(pa.array(~vmask)))
    return merged, vio.to_pandas()


def _build_verdicts(cfg: RunConfig, merged: dict, count_lut: dict) -> pa.Table:
    epoch = cfg.epoch
    row_counts = {
        pid: pickle.loads(m["payload"])
        for (pid, c), m in merged.items()
        if c == ROWCOUNT_CHECK
    }
    pids = sorted(row_counts)
    rows: list[dict] = []

    active_row_checks: dict[str, int] = {}
    for c in cfg.checks:
        if c.name in ROW_CHECKS and c.name not in active_row_checks:
            active_row_checks[c.name] = c.min_support
    for check, min_support in active_row_checks.items():
        for pid in pids:
            nv = count_lut.get((pid, check), 0)
            rows.append(
                {"partition_id": pid, "epoch": epoch, "check": check,
                 # W1 debounce: a partition "block-fails" only at
                 # min_support violations (default 1 = plain fail)
                 "pass": nv < min_support, "n_rows": row_counts[pid],
                 "n_violations": nv, "stats_json": "{}"}
            )
        # orphan-side verdict (partition -1) for referential
        if check == "referential" and (-1, check) in count_lut:
            nv = count_lut[(-1, check)]
            rows.append(
                {"partition_id": -1, "epoch": epoch, "check": check,
                 "pass": False, "n_rows": 0, "n_violations": nv,
                 "stats_json": "{}"}
            )

    # stat checks → informational verdicts with stats_json
    stats = cfg.get(StatsCheck)
    if stats is not None:
        for pid in pids:
            m = merged.get((pid, "stats"))
            if not m:
                continue
            st = pickle.loads(m["payload"])
            pretty = {
                col: {
                    "n": s["n"], "n_null": s["n_null"], "min": s["min"],
                    "max": s["max"],
                    "mean": (s["sum"] / max(s["n"] - s["n_null"], 1))
                    if s["n"] - s["n_null"] > 0 else None,
                }
                for col, s in st.items()
            }
            rows.append(
                {"partition_id": pid, "epoch": epoch, "check": "stats",
                 "pass": True, "n_rows": m["n_rows"], "n_violations": 0,
                 "stats_json": json.dumps(pretty, sort_keys=True)}
            )

    card = cfg.get(CardinalityCheck)
    if card is not None:
        sketches = {
            pid: HyperLogLog.from_bytes(m["payload"])
            for (pid, c), m in merged.items()
            if c == card.name
        }
        if sketches:
            global_est = HyperLogLog.merge_all(list(sketches.values())).estimate()
            for pid in sorted(sketches):
                rows.append(
                    {"partition_id": pid, "epoch": epoch, "check": card.name,
                     "pass": True, "n_rows": row_counts.get(pid, 0),
                     "n_violations": 0,
                     "stats_json": json.dumps(
                         {"estimate": round(sketches[pid].estimate(), 2),
                          "global_estimate": round(global_est, 2)},
                         sort_keys=True)}
                )

    quant = cfg.get(QuantileCheck)
    if quant is not None:
        digs = {
            pid: TDigest.from_bytes(m["payload"])
            for (pid, c), m in merged.items()
            if c == quant.name
        }
        if digs:
            # basin-wide thresholds (RAQC flag_basin_* analog, SURVEY.md A3)
            global_td = TDigest.merge_all(list(digs.values()))
            lo_q, hi_q = quant.outlier_percentiles
            lo, hi = global_td.quantile(lo_q), global_td.quantile(hi_q)
            for pid in sorted(digs):
                td = digs[pid]
                frac_out = max(0.0, td.cdf(lo)) + max(0.0, 1.0 - td.cdf(hi))
                rows.append(
                    {"partition_id": pid, "epoch": epoch, "check": quant.name,
                     "pass": True, "n_rows": row_counts.get(pid, 0),
                     "n_violations": 0,
                     "stats_json": json.dumps(
                         {"quantiles": {str(q): round(td.quantile(q), 4)
                                        for q in quant.quantiles},
                          "global_lo": round(lo, 4), "global_hi": round(hi, 4),
                          "frac_beyond_global": round(frac_out, 4)},
                         sort_keys=True)}
                )

    from ..config import BandQuantileCheck

    bq = cfg.get(BandQuantileCheck)
    if bq is not None:
        per_part: dict[int, dict[int, TDigest]] = {}
        for (pid, c), m in merged.items():
            if c != "band_quantile":
                continue
            per_part[pid] = {
                b: TDigest.from_bytes(d) for b, d in pickle.loads(m["payload"]).items()
            }
        if per_part:
            # global per-band digests → per-band thresholds (the broadcast
            # threshold-table lookup, SURVEY.md J3 / RAQC flag_blocks)
            all_bands: dict[int, list[TDigest]] = {}
            for bands_ in per_part.values():
                for b, td in bands_.items():
                    all_bands.setdefault(b, []).append(td)
            lo_q, hi_q = bq.outlier_percentiles
            thresholds = {
                b: (
                    (g := TDigest.merge_all(tds)).quantile(lo_q),
                    g.quantile(hi_q),
                )
                for b, tds in all_bands.items()
            }
            for pid in sorted(per_part):
                bands_ = per_part[pid]
                total_w = sum(td.n for td in bands_.values())
                frac = 0.0
                for b, td in bands_.items():
                    lo, hi = thresholds[b]
                    f = max(0.0, td.cdf(lo)) + max(0.0, 1.0 - td.cdf(hi))
                    frac += (td.n / max(total_w, 1)) * f
                ok = (bq.max_outlier_fraction is None
                      or frac <= bq.max_outlier_fraction)
                rows.append(
                    {"partition_id": pid, "epoch": epoch, "check": "band_quantile",
                     "pass": bool(ok), "n_rows": row_counts.get(pid, 0),
                     "n_violations": 0,
                     "stats_json": json.dumps(
                         {"frac_beyond_band_thresholds": round(frac, 4),
                          "n_bands": len(bands_),
                          "thresholds": {str(b): [round(t[0], 4), round(t[1], 4)]
                                         for b, t in sorted(thresholds.items())}},
                         sort_keys=True)}
                )

    if not rows:
        return VERDICTS_SCHEMA.empty_table()
    df = pd.DataFrame(rows).sort_values(["epoch", "check", "partition_id"])
    return pa.Table.from_pandas(df, schema=VERDICTS_SCHEMA, preserve_index=False)


_PAIR_PID_OFFSET = 1 << 40


def _fused_pair_passa(baseline_paths, current_paths,
                      baseline_cfg: RunConfig, current_cfg: RunConfig):
    """Run Pass A ONCE over both epochs' files, split the (output-sized)
    result per epoch with plain Ray tasks, then run the two epoch
    pipelines concurrently with their Pass A handed in precomputed.

    Requires identical check configs and path-mode partitioning (the
    caller guards).  e2 rows are tagged by adding ``_PAIR_PID_OFFSET``
    to their partition id inside the fused pid fn; the split task
    restores ids and stamps each epoch's label into the ``epoch``
    column.  Partial merges are associative and every check is
    (epoch, pid)-local, so results match the two-execution path
    (asserted by test_validate_e2e / test_fused_pair)."""
    import copy
    import re as _re
    from concurrent.futures import ThreadPoolExecutor

    import ray

    rx = _re.compile(baseline_cfg.partition_from[1])
    e2set = frozenset(str(p) for p in current_paths)

    def fused_pid(batch: pa.Table) -> np.ndarray:
        paths = batch["path"].to_pylist()
        lut: dict[str, int] = {}
        out = np.empty(len(paths), dtype=np.int64)
        for i, p in enumerate(paths):
            v = lut.get(p)
            if v is None:
                m = rx.search(p)
                v = int(m.group(1)) if m else 0
                if p in e2set:
                    v += _PAIR_PID_OFFSET
                lut[p] = v
            out[i] = v
        return out

    total = (int(ray.cluster_resources().get("CPU", 4))
             if ray.is_initialized() else 4)
    fcfg = copy.copy(baseline_cfg)
    fcfg.partition_from = ("path_fn", fused_pid)
    fcfg.epoch = "__pair__"
    if not fcfg.decode_concurrency:
        fcfg.decode_concurrency = max(1, min(total - 2, (3 * total) // 4))

    e1_label, e2_label = baseline_cfg.epoch, current_cfg.epoch

    @ray.remote(num_cpus=1, num_returns=2)
    def _esplit(tbl: pa.Table):
        pids = tbl["partition_id"].to_numpy(zero_copy_only=False)
        m2 = pids >= _PAIR_PID_OFFSET
        i_pid = tbl.schema.get_field_index("partition_id")
        i_ep = tbl.schema.get_field_index("epoch")

        def fix(part: pa.Table, sub: np.ndarray, label: str, off: int):
            part = part.set_column(
                i_pid, "partition_id", pa.array(sub - off, pa.int64()))
            return part.set_column(
                i_ep, "epoch",
                pa.array([label] * part.num_rows, type=pa.string()))

        t1 = fix(tbl.filter(pa.array(~m2)), pids[~m2], e1_label, 0)
        t2 = fix(tbl.filter(pa.array(m2)), pids[m2], e2_label,
                 _PAIR_PID_OFFSET)
        return t1, t2

    def _build():
        """Decode execution + per-epoch split — runs in its own thread
        so each epoch's narrow reads / shuffle checks overlap the
        decode, exactly as they did with per-epoch Pass A."""
        passa_all = run_passa(
            list(baseline_paths) + list(current_paths), fcfg
        ).materialize()
        pairs = [_esplit.remote(r) for r in passa_all.to_arrow_refs()]
        return (rd.from_arrow_refs([p[0] for p in pairs]),
                rd.from_arrow_refs([p[1] for p in pairs]))

    with ThreadPoolExecutor(max_workers=3) as ex:
        both = ex.submit(_build)
        f1 = ex.submit(validate_epoch, baseline_paths, baseline_cfg,
                       _IndexedFuture(both, 0))
        f2 = ex.submit(validate_epoch, current_paths, current_cfg,
                       _IndexedFuture(both, 1))
        return f1.result(), f2.result()


class _IndexedFuture:
    """Lazy handle to one element of a future tuple — lets the fused
    pair hand each epoch its Pass A before the decode has finished."""

    def __init__(self, fut, idx: int):
        self._fut = fut
        self._idx = idx

    def result(self):
        return self._fut.result()[self._idx]


def validate_epoch_pair(
    baseline_paths, current_paths, baseline_cfg: RunConfig, current_cfg: RunConfig
) -> tuple[EpochResult, EpochResult]:
    """Validate two repeat epochs and append drift verdicts (computed on the
    tiny merged histograms) to the current epoch's verdict table.

    The two epochs run CONCURRENTLY (driver threads): each epoch's
    pipeline has serial driver-side sections (blocking small collects,
    stage startup); overlapping them hides that fixed cost behind the
    other epoch's cluster work — this is what lifts the N→4N scaling
    efficiency, since fixed cost is what stops scaling."""
    import copy
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    import ray

    fused_ok = (
        not _os.environ.get("RAQC_SEQ_PAIR")
        and _os.environ.get("RAQC_FUSED_PAIR", "1").lower()
        not in ("0", "false")
        and baseline_cfg.partition_from[0] == "path"
        and baseline_cfg.partition_from == current_cfg.partition_from
        and baseline_cfg.checks == current_cfg.checks
        and baseline_cfg.batch_size == current_cfg.batch_size
        and baseline_cfg.read_columns == current_cfg.read_columns
    )
    if _os.environ.get("RAQC_SEQ_PAIR"):
        r1 = validate_epoch(baseline_paths, baseline_cfg)
        r2 = validate_epoch(current_paths, current_cfg)
    elif fused_ok:
        # Fused Pass A: ONE decode execution over BOTH epochs' files.
        # Two concurrent per-epoch executions each got half the actor
        # budget, paid their own pool ramp-up, and idled when one epoch
        # drained first; the union stream shares one full-size pool.
        # Epoch attribution rides the partition id (e2 pids offset by
        # 2^40, restored in the split task) — every per-row check and
        # per-(pid) partial is epoch-local by construction, and the
        # partial merges are associative, so violations and verdicts
        # are unchanged.
        r1, r2 = _fused_pair_passa(baseline_paths, current_paths,
                                   baseline_cfg, current_cfg)
    else:
        # split the decode-actor budget between the two concurrent pools —
        # two auto-sized pools would jointly reserve every CPU and starve
        # the readers (the single-pipeline sizing rule, halved)
        total = (int(ray.cluster_resources().get("CPU", 4))
                 if ray.is_initialized() else 4)
        per_epoch = max(1, min((total - 2) // 2, (3 * total) // 8))
        cfgs = []
        for c in (baseline_cfg, current_cfg):
            if not c.decode_concurrency:
                c = copy.copy(c)
                c.decode_concurrency = per_epoch
            cfgs.append(c)
        baseline_cfg, current_cfg = cfgs

        with ThreadPoolExecutor(max_workers=2) as ex:
            f1 = ex.submit(validate_epoch, baseline_paths, baseline_cfg)
            f2 = ex.submit(validate_epoch, current_paths, current_cfg)
            r1 = f1.result()
            r2 = f2.result()
    spec = current_cfg.get(DriftCheck)
    if spec is not None and current_cfg.get(Hist2DCheck) is not None:
        drows = drift_verdicts(spec, r1.hists(), r2.hists(), current_cfg.epoch)
        if drows:
            dtab = pa.Table.from_pandas(pd.DataFrame(drows), schema=VERDICTS_SCHEMA,
                                        preserve_index=False)
            r2.verdicts = pa.concat_tables([r2.verdicts, dtab])
    return r1, r2


import ray as _ray_mod

_build_verdicts_remote = _ray_mod.remote(num_cpus=1)(_build_verdicts)
