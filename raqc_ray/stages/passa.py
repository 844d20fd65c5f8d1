"""Pass A — the single fat streaming pass over the table under validation.

One ``map_batches`` (actor pool when a DecodeCheck is configured — decoder
state built once per actor, SURVEY.md §2.3 ST4) reads each Arrow batch
zero-copy and emits a union-schema table carrying BOTH output streams
in-band:

- ``kind="v"`` rows — per-row violations (nullity/range/caption/decode),
  the analog of RAQC's mask/flag pixels
  (``[R] raqc/multi_array.py :: mask_basic / mask_advanced (rec.)``).
- ``kind="s"`` rows — one mergeable partial per (partition, stat-check) per
  batch (min/max/null counts, HLL registers, t-digest centroids, 2-D
  histogram counts), the analog of RAQC's in-memory band/histogram state
  (``[R] flag_blocks / outliers_hist (rec.)``), except partials travel
  in-band as rows so no shared mutable state exists and Ray retries stay
  safe (SURVEY.md §3.4).

Downstream, violations are a vectorized ``filter(kind=="v")`` away and the
tiny partials stream goes through ``groupby(partition_id, check) →
merge_partial_group`` — a shuffle over kilobytes, not the data.

Scale notes: the pass never materializes the dataset; per-batch work is
pyarrow/numpy-vectorized except the unavoidable per-row decode loop (a
real codec call per image; batch_size caps the per-actor working set of
fat ``bytes`` rows).
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..codecs import DecodeError, decode_image
from ..partitions import make_pid_fn
from ..config import (
    BandQuantileCheck,
    CaptionCheck,
    CardinalityCheck,
    DecodeCheck,
    ExposureCheck,
    ExprCheck,
    Hist2DCheck,
    NullityCheck,
    QuantileCheck,
    RangeCheck,
    RunConfig,
    StatsCheck,
)
from ..ops.exposure import pixel_stats_of
from ..sketches import HyperLogLog, TDigest
from ..sketches.hll import hash64

PASSA_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # "v" violation | "s" stat partial
        ("partition_id", pa.int64()),
        ("epoch", pa.string()),
        ("check", pa.string()),
        ("image_id", pa.string()),
        ("column", pa.string()),
        ("detail", pa.string()),
        ("severity", pa.string()),
        ("payload", pa.binary()),
        ("n_rows", pa.int64()),
    ]
)

ROWCOUNT_CHECK = "_rows"  # synthetic stat partial: rows per partition


class _Out:
    """Column-list accumulator for the union output table."""

    def __init__(self) -> None:
        self.cols: dict[str, list] = {name: [] for name in PASSA_SCHEMA.names}

    def violation(self, pid, epoch, check, image_id, column, detail, severity):
        c = self.cols
        c["kind"].append("v")
        c["partition_id"].append(int(pid))
        c["epoch"].append(epoch)
        c["check"].append(check)
        c["image_id"].append(image_id)
        c["column"].append(column)
        c["detail"].append(detail)
        c["severity"].append(severity)
        c["payload"].append(None)
        c["n_rows"].append(None)

    def partial(self, pid, epoch, check, payload: bytes, n_rows: int):
        c = self.cols
        c["kind"].append("s")
        c["partition_id"].append(int(pid))
        c["epoch"].append(epoch)
        c["check"].append(check)
        c["image_id"].append(None)
        c["column"].append(None)
        c["detail"].append(None)
        c["severity"].append(None)
        c["payload"].append(payload)
        c["n_rows"].append(int(n_rows))

    def table(self) -> pa.Table:
        return pa.table(self.cols, schema=PASSA_SCHEMA)


class ValidatorStage:
    """Callable class for ``map_batches`` (actor pool when decoding).

    ``__init__`` runs once per actor: compiles the partition-id regex and
    resolves the check list; ``__call__`` runs per batch.
    """

    def __init__(self, cfg: RunConfig):
        self.cfg = cfg
        self.epoch = cfg.epoch
        self._pid_fn = make_pid_fn(cfg.partition_from)
        self.nullity = cfg.get(NullityCheck)
        self.range_ = cfg.get(RangeCheck)
        self.caption = cfg.get(CaptionCheck)
        self.decode = cfg.get(DecodeCheck)
        self.exposure = cfg.get(ExposureCheck)
        # declarative cross-column predicates compile ONCE per actor
        # (ops/exprcheck AST -> pyarrow.compute closure chain)
        self.expr_ = cfg.get(ExprCheck)
        if self.expr_:
            from ..ops.exprcheck import compile_expr
            self._expr_rules = [(r.name, compile_expr(r.expr))
                                for r in self.expr_.rules]
        self.stats = cfg.get(StatsCheck)
        self.card = cfg.get(CardinalityCheck)
        self.quant = cfg.get(QuantileCheck)
        self.band_quant = cfg.get(BandQuantileCheck)
        self.hist = cfg.get(Hist2DCheck)

    # ------------------------------------------------------------ helpers
    def _emit_mask(self, out, mask: np.ndarray, pids, ids, check, column, detail, sev):
        for i in np.flatnonzero(mask):
            out.violation(pids[i], self.epoch, check, ids[i], column, detail, sev)

    # ---------------------------------------------------------------- run
    def __call__(self, batch: pa.Table) -> pa.Table:
        out = _Out()
        n = batch.num_rows
        if n == 0:
            return out.table()
        pids = self._pid_fn(batch)
        id_col = "image_id" if "image_id" in batch.column_names else batch.column_names[0]
        ids = batch[id_col].cast(pa.string()).to_pylist()

        # --- row checks (vectorized masks; RAQC mask_basic/mask_advanced) ---
        if self.nullity:
            for col in self.nullity.columns:
                if col not in batch.column_names:
                    continue
                mask = pc.is_null(batch[col]).to_numpy(zero_copy_only=False)
                self._emit_mask(out, mask, pids, ids, "nullity", col, "null value",
                                self.nullity.severity)

        null_bytes = None
        if self.decode and self.decode.bytes_col in batch.column_names:
            null_bytes = pc.is_null(batch[self.decode.bytes_col]).to_numpy(
                zero_copy_only=False
            )

        range_bad: dict[str, np.ndarray] = {}
        if self.range_:
            for rule in self.range_.rules:
                if rule.column not in batch.column_names:
                    continue
                col = batch[rule.column]
                if rule.is_binary_length:
                    vals = pc.binary_length(col)
                else:
                    vals = col
                valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
                varr = vals.to_numpy(zero_copy_only=False).astype(np.float64)
                bad = np.zeros(n, dtype=bool)
                if rule.min is not None:
                    bad |= varr < rule.min
                if rule.max is not None:
                    bad |= varr > rule.max
                bad &= valid
                range_bad[rule.column] = range_bad.get(rule.column, np.zeros(n, bool)) | bad
                desc = f"len(bytes)" if rule.is_binary_length else rule.column
                self._emit_mask(
                    out, bad, pids, ids, "range", rule.column,
                    f"{desc} outside [{rule.min}, {rule.max}]", self.range_.severity,
                )

        if self.expr_:
            from ..ops.exprcheck import violation_mask
            # mask chain (RAQC mask_advanced after mask_basic): rows
            # already flagged by RangeCheck are excluded so each
            # planted corruption surfaces exactly once (FIXTURES §3)
            any_range = np.zeros(n, dtype=bool)
            for m in range_bad.values():
                any_range |= m
            for rname, fn in self._expr_rules:
                try:
                    bad = violation_mask(fn, batch)
                except KeyError:
                    continue  # rule references a column this table lacks
                bad &= ~any_range
                self._emit_mask(out, bad, pids, ids, "expr", rname,
                                "expression not satisfied",
                                self.expr_.severity)

        if self.caption and self.caption.column in batch.column_names:
            col = batch[self.caption.column]
            trimmed = pc.utf8_trim_whitespace(pc.fill_null(col, "x"))
            empty = pc.and_(
                pc.is_valid(col), pc.equal(pc.binary_length(trimmed), 0)
            ).to_numpy(zero_copy_only=False)
            self._emit_mask(out, empty, pids, ids, "caption", self.caption.column,
                            "empty caption", self.caption.severity)

        # --- decode (per-row codec loop; gated by nullity/range) ---
        pixel_mean = np.full(n, np.nan)
        if self.decode and self.decode.bytes_col in batch.column_names:
            d = self.decode
            # Zero-copy access to the Arrow binary column: slice the value
            # buffer per row instead of to_pylist(), which would copy
            # EVERY image into Python bytes up front (ADVICE r2).  Only
            # rows that actually decode pay a single bytes() copy, one at
            # a time.
            from ..arrow_util import binary_row_accessor

            _row_bytes = binary_row_accessor(batch[d.bytes_col])
            fmts = batch[d.fmt_col].to_pylist()
            ws = batch[d.w_col].to_numpy(zero_copy_only=False)
            hs = batch[d.h_col].to_numpy(zero_copy_only=False)
            dims_ok = (
                (ws >= d.w_min) & (ws <= d.w_max) & (hs >= d.w_min) & (hs <= d.w_max)
            )
            for i in range(n):
                if not dims_ok[i]:
                    continue  # already reported by nullity/range
                b = _row_bytes(i)
                if b is None or len(b) == 0:
                    continue
                try:
                    img = decode_image(b, fmts[i])
                except DecodeError as e:
                    out.violation(pids[i], self.epoch, "decode", ids[i], "bytes",
                                  f"decode failed: {e}", d.severity)
                    continue
                dh, dw = img.shape[0], img.shape[1]
                if dw != ws[i]:
                    out.violation(pids[i], self.epoch, "decode", ids[i], "w",
                                  f"declared w={ws[i]} decoded w={dw}", d.severity)
                elif dh != hs[i]:
                    out.violation(pids[i], self.epoch, "decode", ids[i], "h",
                                  f"declared h={hs[i]} decoded h={dh}", d.severity)
                pixel_mean[i] = float(img.mean())
                if self.exposure is not None:
                    # same decoded pixels, no second decode (the fused
                    # triage discipline of ops/quarantine, in-stage)
                    e = self.exposure
                    n_px, _, _, n_lo, n_hi = pixel_stats_of(
                        img, e.lo_c, e.hi_c)
                    if (n_lo + n_hi) * 1000 > e.max_clip_permille * n_px:
                        out.violation(
                            pids[i], self.epoch, "exposure", ids[i],
                            "bytes",
                            f"clipped {n_lo + n_hi}/{n_px} px "
                            f"(> {e.max_clip_permille}‰)",
                            e.severity)

        # --- stat partials per partition in this batch ---
        uniq_pids = np.unique(pids)
        for pid in uniq_pids:
            sel = pids == pid
            out.partial(pid, self.epoch, ROWCOUNT_CHECK,
                        pickle.dumps(int(sel.sum())), int(sel.sum()))

        if self.stats:
            for pid in uniq_pids:
                selnp = pids == pid
                nsel = int(selnp.sum())
                sel = pa.array(selnp)
                st: dict[str, dict] = {}
                for col in self.stats.columns:
                    if col not in batch.column_names:
                        continue
                    sub = batch[col].filter(sel)
                    vals = sub.drop_null().to_numpy(zero_copy_only=False).astype(
                        np.float64
                    )
                    st[col] = {
                        "n": int(len(sub)),
                        "n_null": int(sub.null_count),
                        "min": float(np.min(vals)) if vals.size else None,
                        "max": float(np.max(vals)) if vals.size else None,
                        "sum": float(np.sum(vals)) if vals.size else 0.0,
                    }
                out.partial(pid, self.epoch, "stats", pickle.dumps(st), nsel)

        if self.card and self.card.column in batch.column_names:
            hashes = hash64(batch[self.card.column].to_pylist())
            for pid in uniq_pids:
                sel = pids == pid
                hll = HyperLogLog(self.card.p)
                hll.add_hashes(hashes[sel])
                out.partial(pid, self.epoch, self.card.name, hll.to_bytes(),
                            int(sel.sum()))

        if self.quant and self.quant.column in batch.column_names:
            vals = batch[self.quant.column].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            for pid in uniq_pids:
                sel = pids == pid
                td = TDigest(self.quant.delta)
                td.add(vals[sel])
                out.partial(pid, self.epoch, self.quant.name, td.to_bytes(),
                            int(sel.sum()))

        if self.band_quant:
            bq = self.band_quant
            vals = self._feature(batch, bq.value, pixel_mean)
            bands_f = self._feature(batch, bq.band_of, pixel_mean)
            band_ids = np.where(
                np.isnan(bands_f), -1, np.floor(bands_f / bq.band_width)
            ).astype(np.int64)
            # F4: conditioned band key = (category, band) — thresholds are
            # then per-category downstream (fmt-conditioned outliers)
            if bq.condition_on and bq.condition_on in batch.column_names:
                cat_codes, cat_uniq = pd.factorize(
                    np.asarray(batch[bq.condition_on].cast(pa.string())
                               .to_pylist(), dtype=object))
            else:
                cat_codes, cat_uniq = None, None
            for pid in uniq_pids:
                sel = (pids == pid) & ~np.isnan(vals) & (band_ids >= 0)
                per_band: dict = {}
                if cat_codes is None:
                    for b in np.unique(band_ids[sel]):
                        td = TDigest(bq.delta)
                        td.add(vals[sel & (band_ids == b)])
                        per_band[int(b)] = td.to_bytes()
                else:
                    # Group on (cat_code, band_id) pairs directly — no
                    # arithmetic packing (band_id has no upper bound, and
                    # factorize code -1 marks a null condition value, which
                    # must be skipped, not aliased onto the last category).
                    cc = cat_codes.astype(np.int64)
                    sel_c = sel & (cc >= 0)
                    pairs = np.stack([cc[sel_c], band_ids[sel_c]], axis=1)
                    vsel = vals[sel_c]
                    if pairs.size:
                        for ci, b in np.unique(pairs, axis=0):
                            td = TDigest(bq.delta)
                            td.add(vsel[(pairs[:, 0] == ci) & (pairs[:, 1] == b)])
                            per_band[(str(cat_uniq[ci]), int(b))] = td.to_bytes()
                    sel = sel_c
                out.partial(pid, self.epoch, "band_quantile",
                            pickle.dumps(per_band), int(sel.sum()))

        if self.hist:
            hx = self._feature(batch, self.hist.x, pixel_mean)
            hy = self._feature(batch, self.hist.y, pixel_mean)
            bins = self.hist.bins
            xe = np.linspace(*self.hist.x_range, bins + 1)
            ye = np.linspace(*self.hist.y_range, bins + 1)
            for pid in uniq_pids:
                sel = (pids == pid) & ~np.isnan(hx) & ~np.isnan(hy)
                hcounts, _, _ = np.histogram2d(hx[sel], hy[sel], bins=[xe, ye])
                out.partial(pid, self.epoch, "hist2d",
                            pickle.dumps(hcounts.astype(np.int64)), int(sel.sum()))

        return out.table()

    def _feature(self, batch: pa.Table, spec: str, pixel_mean: np.ndarray) -> np.ndarray:
        if spec == "__pixel_mean__":
            return pixel_mean
        if spec == "__bytelen_log2__":
            col = batch[self.decode.bytes_col if self.decode else "bytes"]
            lens = pc.binary_length(pc.fill_null(col, b"")).to_numpy(
                zero_copy_only=False
            ).astype(np.float64)
            with np.errstate(divide="ignore"):
                return np.where(lens > 0, np.log2(np.maximum(lens, 1)), np.nan)
        arr = batch[spec].to_numpy(zero_copy_only=False)
        return arr.astype(np.float64)


# ------------------------------------------------------------------ merge


def merge_payloads(check: str, payloads: list[bytes]) -> bytes:
    """Merge serialized partials of one check — associative and
    order-canonicalized (SURVEY.md §7 determinism requirement)."""
    if check == ROWCOUNT_CHECK:
        merged = pickle.dumps(sum(pickle.loads(p) for p in payloads))
    elif check == "stats":
        acc: dict[str, dict] = {}
        for p in payloads:
            st = pickle.loads(p)
            for col, s in st.items():
                a = acc.setdefault(
                    col, {"n": 0, "n_null": 0, "min": None, "max": None, "sum": 0.0}
                )
                a["n"] += s["n"]
                a["n_null"] += s["n_null"]
                if s["min"] is not None:
                    a["min"] = s["min"] if a["min"] is None else min(a["min"], s["min"])
                if s["max"] is not None:
                    a["max"] = s["max"] if a["max"] is None else max(a["max"], s["max"])
                a["sum"] += s["sum"]
        merged = pickle.dumps(acc)
    elif check.startswith("cardinality:"):
        merged = HyperLogLog.merge_all(
            [HyperLogLog.from_bytes(p) for p in payloads]
        ).to_bytes()
    elif check.startswith("quantile:"):
        merged = TDigest.merge_all([TDigest.from_bytes(p) for p in payloads]).to_bytes()
    elif check == "band_quantile":
        # keys are ints (unconditioned) or (category, band) tuples (F4) —
        # kept as-is so conditioned digests never merge across categories
        acc_b: dict = {}
        for p in payloads:
            for b, d in pickle.loads(p).items():
                acc_b.setdefault(b, []).append(d)
        merged = pickle.dumps(
            {
                b: TDigest.merge_all([TDigest.from_bytes(x) for x in lst]).to_bytes()
                for b, lst in acc_b.items()
            }
        )
    elif check == "hist2d":
        merged = pickle.dumps(sum(pickle.loads(p) for p in payloads))
    else:
        merged = payloads[0]
    return merged


def premerge_block(df, cfg: RunConfig):
    """Distributed combiner over the partial stream: merge partials per
    (partition, check) WITHIN each block before anything is collected —
    after this, the driver sees ≈ one payload per (partition, check) per
    block instead of one per batch, shrinking the serial merge ~10×."""
    import pandas as pd

    out = {k: [] for k in ("partition_id", "epoch", "check", "payload", "n_rows")}
    for (pid, epoch, check), g in df.groupby(
        ["partition_id", "epoch", "check"], sort=False
    ):
        out["partition_id"].append(int(pid))
        out["epoch"].append(epoch)
        out["check"].append(check)
        out["payload"].append(merge_payloads(check, [bytes(p) for p in g["payload"]]))
        out["n_rows"].append(int(g["n_rows"].sum()))
    return pd.DataFrame(out)


def merge_partial_group(group, cfg: RunConfig):
    """groupby([...]).map_groups body over the kind="s" stream (pandas in /
    pandas out) — the distributed merge path used when the partial stream
    is too large for the driver."""
    import pandas as pd

    check = group["check"].iloc[0]
    payloads = [bytes(p) for p in group["payload"]]
    return pd.DataFrame(
        {
            "partition_id": [int(group["partition_id"].iloc[0])],
            "epoch": [group["epoch"].iloc[0]],
            "check": [check],
            "payload": [merge_payloads(check, payloads)],
            "n_rows": [int(group["n_rows"].sum())],
        }
    )
