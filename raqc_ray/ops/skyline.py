"""2-D skyline (pareto front) — rows not dominated on a
(minimize x, maximize y) pair of criteria.

Domination: row r is dominated iff some row s has ``s.x ≤ r.x`` and
``s.y ≥ r.y`` with at least one strict.  Duplicate (x, y) points do
NOT dominate each other, so all copies of a surviving point are kept —
exactly the SQL ``NOT EXISTS`` anti-join semantics, making the output
deterministic and layout-invariant.

Ray-Data-first plan: the skyline operator is a natural combiner —
membership in the global skyline implies membership in any subset's
skyline, so a per-block vectorized sweep prunes each block to its
local front (expected O(log n) survivors on non-degenerate data), and
one final sweep over the union of the tiny per-block fronts (run in a
single task via ``repartition(1)``, never on the driver) yields the
global front.  Nothing row-scale ever moves: the only exchange is
survivors × blocks.

Sweep: sort by (x asc, y desc); a row survives iff its y equals its
x-group's max AND strictly exceeds the running max y over smaller x —
one cummax, no joins.  Criteria must be totally ordered (int64 cents /
epoch days in the oracled query).

RAQC analog: none; §2 training-data surface (quality-vs-cost frontier
audits — e.g. highest-quality document per byte-budget level).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _sweep(df: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Vectorized skyline filter of one frame (min x, max y)."""
    if not len(df):
        return df
    s = df.sort_values([x, y], ascending=[True, False], kind="mergesort")
    xv = s[x].to_numpy()
    yv = s[y].to_numpy()
    # max y within each equal-x run = y of the run's first row
    first = np.ones(len(s), dtype=bool)
    first[1:] = xv[1:] != xv[:-1]
    run_id = np.cumsum(first) - 1
    run_max = yv[first][run_id]
    # running max y over strictly smaller x: cummax of run maxima,
    # shifted one run back
    rm = np.maximum.accumulate(yv[first])
    prev_max = np.where(run_id > 0, rm[np.maximum(run_id - 1, 0)],
                        np.iinfo(np.int64).min)
    keep = (yv == run_max) & (yv > prev_max)
    return s[keep]


def skyline2d(ds, x: str, y: str):
    """Dataset of the input rows on the (min ``x``, max ``y``) pareto
    front, all columns preserved.  ``x`` / ``y`` must be integer-typed
    (exact comparisons)."""
    pruned = ds.map_batches(lambda df: _sweep(df, x, y),
                            batch_format="pandas")
    return pruned.repartition(1).map_batches(
        lambda df: _sweep(df, x, y), batch_format="pandas")
