"""Event-sequence pattern census — MATCH_RECOGNIZE-flavored complex
event processing: per key, serialize the totally-ordered event-type
stream and count non-overlapping matches of a declared regex over it.

The pattern language is a regular expression over the separator-joined
state string (states must not contain the separator), which covers the
practical CEP core — funnels with repetition (``view(>click)+``),
forbidden interleavings, retry storms (``(error>){3,}``) — without a
bespoke automaton DSL.  Non-overlapping leftmost matching is exactly
``re.findall`` / DuckDB ``regexp_extract_all``, so the SQL oracle
replays the census bit-for-bit (keep patterns in the RE2-compatible
subset: no backreferences/lookaround).

Ray-Data-first plan: the shared window-family shape — ONE sort by
``(key, order_by, tiebreak)`` via :func:`raqc_ray.ops.groupscan
.scan_sorted_groups`, each sorted block serializing its complete
groups in-place (per-group join + one compiled-regex scan — group
calls are plain slices inside the block task, no task per key); hot
keys ride groupscan's size-routed boundary handling.  Output is
match-keys only (violation-sized).

Partitioning assumption: one key's full event stream fits a worker
(the irreducible contract of whole-sequence semantics — same as
sessionization / journey_prefix).

RAQC analog: none; §2 LLM-pipeline surface (behavioral-sequence
quality gates).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .groupscan import scan_sorted_groups


def sequence_pattern_census(ds, key: str, order_by: str, state_col: str,
                            pattern: str, tiebreak: str | None = None,
                            sep: str = ">"):
    """Dataset ``(key, n_matches, n_events)`` — one row per key whose
    ``sep``-joined, ``(order_by, tiebreak)``-ordered state string
    contains ≥ 1 non-overlapping match of ``pattern``."""
    from ._join_util import arrow_schema

    sort_cols = [order_by] + ([tiebreak] if tiebreak else [])
    rx = re.compile(pattern)

    out_empty = arrow_schema(ds).empty_table().to_pandas()[[key]]
    out_empty["n_matches"] = pd.Series(dtype="int64")
    out_empty["n_events"] = pd.Series(dtype="int64")

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(sort_cols, kind="mergesort")
        journey = sep.join(s[state_col].astype(str))
        n = len(rx.findall(journey))
        if n == 0:
            return out_empty
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n_matches": np.int64(n),
                             "n_events": np.int64(len(g))})

    return scan_sorted_groups(ds, key, group_fn, out_empty, min_group=1)
