"""Shared helpers for shuffle-check outputs."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..schema import VIOLATIONS_SCHEMA

VIOLATION_COLS = ["partition_id", "epoch", "check", "image_id", "column",
                  "detail", "severity"]


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


def cast_violations(ds):
    """Normalize any violation-shaped Dataset to VIOLATIONS_SCHEMA."""
    return ds.map_batches(
        lambda t: t.select(VIOLATION_COLS).cast(VIOLATIONS_SCHEMA),
        batch_format="pyarrow",
    )
