"""Pivot / crosstab — long-to-wide count (or value-sum) aggregation
with a declared label domain.

``pivot_agg(ds, key, label_col, labels, value_col=None)`` turns each
``(key, label)`` group into one column per label: counts when
``value_col`` is None, sums of ``value_col`` otherwise. The label
domain is DECLARED by the caller, not discovered — at 10^12 rows a
discovery pass is a full extra scan, and a declared domain keeps the
output schema stable for downstream writers (unexpected labels land in
no column; add an explicit label to keep them).

Plan (one shuffle, combiner first):

1. ``map_batches`` partial crosstab per block — vectorized
   ``np.unique`` over factorized (key, label) pairs, emitting one row
   per key per block with the wide columns already in place. This is
   the combiner: the shuffle input is ≈ |keys per block|, not rows;
2. ``groupby(key).aggregate(Sum per label column)`` merges partials —
   Ray-native hash aggregation, no map_groups, no driver loop.

RAQC analog: none (SURVEY §2.5 has no reshaping aggregate); part of
the §2 "large-scale training-data pipeline" surface (per-domain format
mix, per-user event profiles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pivot_agg(ds, key: str, label_col: str, labels: list[str],
              value_col: str | None = None, prefix: str = ""):
    """Dataset with columns ``key`` + one ``<prefix><label>`` per
    label (int64 counts, or float64 sums of ``value_col``)."""
    from ray.data.aggregate import Sum

    out_cols = [f"{prefix}{lb}" for lb in labels]
    lab_index = {lb: i for i, lb in enumerate(labels)}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, key_codes = np.unique(df[key].to_numpy(), return_inverse=True)
        lab_codes = df[label_col].map(lab_index).to_numpy()
        known = ~pd.isna(lab_codes)
        nl = len(labels)
        if known.any():
            comb = key_codes[known] * nl + lab_codes[known].astype(np.int64)
            w = (df[value_col].to_numpy(dtype=np.float64)[known]
                 if value_col else None)
            grid = np.bincount(comb, weights=w,
                               minlength=len(keys) * nl).reshape(-1, nl)
        else:
            grid = np.zeros((len(keys), nl))
        if not value_col:
            grid = grid.astype(np.int64)
        out = {key: keys}
        for j, c in enumerate(out_cols):
            out[c] = grid[:, j]
        return pd.DataFrame(out)

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(key).aggregate(
        *[Sum(c, alias_name=c) for c in out_cols]
    )


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_name: str = "measure", value_name: str = "value"):
    """Wide-to-long reshape (SQL ``UNPIVOT`` / pandas ``melt``): one
    output row per input row per entry of ``value_cols``, tagged with
    the source column name.  Pure per-block ``map_batches`` — k× row
    fan-out with NO shuffle, streaming-safe at any scale (each output
    block is built from one input block; Ray's block sizing splits
    oversize outputs downstream)."""

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        frames = []
        for c in value_cols:
            part = df[id_cols].copy()
            part[var_name] = np.full(n, c, dtype=object)
            part[value_name] = df[c].to_numpy(dtype=np.float64)
            frames.append(part)
        return pd.concat(frames, ignore_index=True)

    return ds.select_columns(id_cols + value_cols).map_batches(
        melt, batch_format="pandas")
