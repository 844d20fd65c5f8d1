"""Binding Arrow schemas for the validation engine.

The images schema is fixed by the task spec (BASELINE.json:15 ``input_hint``):
``image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64``.  The violation/verdict output schemas are the
tabular analogs of RAQC's uint8 flag bands and stats CSV
(``[R] raqc/multi_array.py :: save_tiff / stats_report (rec.)``; SURVEY.md §1.2).
"""

from __future__ import annotations

import pyarrow as pa

# The table under validation (binding; FIXTURES.md §1).
IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# Side table for the referential check (FIXTURES.md §2).
CAPTIONS_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("caption", pa.string()),
    ]
)

# Engine output #1 — violation rows (flag-band analog; SURVEY.md §1.2).
VIOLATIONS_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int64()),
        ("epoch", pa.string()),
        ("check", pa.string()),
        ("image_id", pa.string()),
        ("column", pa.string()),
        ("detail", pa.string()),
        ("severity", pa.string()),
    ]
)

# Engine output #2 — per-(partition, check) verdicts (stats-CSV analog).
VERDICTS_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int64()),
        ("epoch", pa.string()),
        ("check", pa.string()),
        ("pass", pa.bool_()),
        ("n_rows", pa.int64()),
        ("n_violations", pa.int64()),
        ("stats_json", pa.string()),
    ]
)

VIOLATION_SORT_KEYS = ["epoch", "check", "image_id", "column"]
VERDICT_SORT_KEYS = ["epoch", "check", "partition_id"]


def empty_violations() -> pa.Table:
    return VIOLATIONS_SCHEMA.empty_table()


def empty_verdicts() -> pa.Table:
    return VERDICTS_SCHEMA.empty_table()
