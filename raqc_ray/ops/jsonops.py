"""JSON field extraction over a string column — the semi-structured
payload decode every event-log pipeline needs before it can aggregate.

Ray-Data-first plan: scalar-field extraction is a pure ``map_batches``
with ``pyarrow.compute.extract_regex`` — zero-copy in, one pass over
the block's UTF-8 buffer, no Python object per row, no ``json.loads``.
The regex path intentionally handles FLAT scalar fields only (the
overwhelming case for event-property columns); rows where the field is
absent or non-scalar yield null, and callers needing full nested JSON
should decode inside an actor-pool stage instead (same plumbing as
:mod:`raqc_ray.ops.multimodal` — the cost is per-row parsing, so it is
opt-in, not the default path).

RAQC analog: none (SURVEY §2.7 scalar functions are numeric); part of
the §2 training-data-pipeline surface (event-property filters, metadata
projection before the wide steps).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def extract_json_int(ds, col: str, field: str, out_col: str | None = None):
    """Appends ``out_col`` (int64, null when absent/non-integer): the
    value of flat scalar ``"field": <int>`` inside the JSON string
    ``col``.  Equivalent to SQL ``CAST(json_extract(col, '$.field') AS
    BIGINT)`` for flat integer fields."""
    out_col = out_col or field
    # \"field\"\s*:\s*(-?digits) — named group required by extract_regex
    pat = f'"{field}"\\s*:\\s*(?P<v>-?\\d+)'

    def fn(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b[col], pat)
        v = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return b.append_column(out_col, v)

    return ds.map_batches(fn, batch_format="pyarrow")
