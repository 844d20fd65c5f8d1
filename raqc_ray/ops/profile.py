"""One-pass column profiler — the table-wide data-quality summary a
validation engine hands an operator before any check config exists:
per column → row count, null count, exact distinct count, min/max,
mean value (numerics) / mean codepoint length (strings).

Ray-Data-first plan: ``map_batches`` reduces each block to one partial
row PER COLUMN (nulls / min / max / sums via ``pyarrow.compute``
kernels; distinct as the block's DISTINCT 64-bit HASH set) — the
driver-side merge then runs over (columns × blocks) partial rows only.
Distinct counts merge exactly by unioning the per-block hash sets
(int64 — profiling-scale cardinalities); for 10^12-row tables swap the
set payload for the HLL sketch (:mod:`raqc_ray.sketches.hll`) — same
plan, ±2%.  min/max merge TYPED (python comparison on native values),
stringified only in the final report.

RAQC analog: SURVEY §2.5 A6 column stats (per-partition); this is the
table-global profiling twin, part of the §2 training-data-pipeline
surface (pre-ingest audits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.hll import hash64


def profile_table(ds, columns: list[str], round_to: int = 4):
    """Dataset → pandas DataFrame, one row per profiled column:
    ``(col, n, n_null, n_distinct, min_val, max_val, avg_val)`` —
    min/max rendered as strings in the final report; ``avg_val`` is
    the mean of numeric columns and the mean codepoint length of
    string columns."""

    def block_profile(b: pa.Table) -> pd.DataFrame:
        rows = []
        for col in columns:
            arr = b[col]
            valid = arr.drop_null()
            if pa.types.is_string(arr.type) or pa.types.is_large_string(
                    arr.type):
                s = float(pc.sum(pc.utf8_length(valid)).as_py() or 0)
            else:
                s = float(pc.sum(valid).as_py() or 0)
            kh = hash64(valid.cast(pa.string()).to_pylist()).view(np.int64)
            rows.append({
                "col": col,
                "n": len(arr),
                "n_null": int(arr.null_count),
                "sum": s,
                "vmin": pc.min(valid).as_py() if len(valid) else None,
                "vmax": pc.max(valid).as_py() if len(valid) else None,
                "hashes": np.unique(kh).tobytes(),
            })
        return pd.DataFrame(rows)

    parts = ds.map_batches(block_profile, batch_format="pyarrow",
                           batch_size=None).to_pandas()

    out_rows = []
    for col, g in parts.groupby("col", sort=False):
        n = int(g["n"].sum())
        n_null = int(g["n_null"].sum())
        hs = np.unique(np.concatenate(
            [np.frombuffer(b, dtype=np.int64) for b in g["hashes"]]))
        mins = [m for m in g["vmin"] if m is not None]
        maxs = [m for m in g["vmax"] if m is not None]
        n_valid = n - n_null
        out_rows.append({
            "col": col,
            "n": n,
            "n_null": n_null,
            "n_distinct": int(len(hs)),
            "min_val": str(min(mins)) if mins else "",
            "max_val": str(max(maxs)) if maxs else "",
            "avg_val": round(float(g["sum"].sum()) / n_valid, round_to)
            if n_valid else float("nan"),
        })
    return (pd.DataFrame(out_rows).sort_values("col")
            .reset_index(drop=True))


def grouped_checksum(ds, key: str, cols: list[str], hex_chars: int = 10):
    """Order-invariant per-group content checksum — the cross-epoch /
    cross-engine table-equality primitive of a validation engine: two
    runs (or two replicas) of the same logical table produce identical
    ``(key, checksum, n)`` rows regardless of row order, block layout
    or cluster size, because the per-row hash values are summed.

    Per row: ``int(md5(col1 || '|' || col2 ...)[: hex_chars hex], 16)``
    (exactly DuckDB's ``CAST('0x' || substr(md5(...), 1, hex_chars) AS
    BIGINT)``, so the op is fully SQL-oracled).  ``cols`` must be
    int64 or string columns (nulls hash as '').

    Plan: per-block combiner sums each key's row hashes locally, then
    one keys-sized groupby Sum — the row stream never reshuffles.
    Overflow budget: hex_chars=10 → 40-bit row values; an int64 sum is
    exact to ~2^23 rows per (key, block) and ~2^23 blocks; for
    10^12-row tables either keep hex_chars ≤ 8 or switch the finish to
    a mod-(2^61-1) Python-int merge (the partial layout is unchanged).
    """
    import hashlib

    from ray.data.aggregate import Sum

    def block(df: pd.DataFrame) -> pd.DataFrame:
        s = None
        for c in cols:
            col = df[c]
            part = (col.fillna("").astype(str) if col.dtype == object
                    else col.astype("int64").astype(str))
            s = part if s is None else s + "|" + part
        v = s.map(lambda x: int(
            hashlib.md5(x.encode("utf-8")).hexdigest()[:hex_chars], 16)
        ).astype("int64")
        out = pd.DataFrame({key: df[key], "checksum": v,
                            "n": np.ones(len(df), dtype=np.int64)})
        return out.groupby(key, sort=False, as_index=False).sum()

    return (ds.map_batches(block, batch_format="pandas")
            .groupby(key)
            .aggregate(Sum("checksum", alias_name="checksum"),
                       Sum("n", alias_name="n")))
