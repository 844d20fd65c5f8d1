"""CDC MERGE (upsert/delete application) — the lakehouse table-
maintenance primitive (`MERGE INTO` / Delta-Lake CDF apply): given a
base table and a change set of keyed rows marked insert/update/
delete, produce the next table version.

Semantics (idempotent-put): the change set wins on key collision —

    result = (base ANTI JOIN change-keys)  UNION  (changes with op != 'D')

'I' and 'U' are both "put" (last-writer-wins within one change set is
the CALLER's contract: one row per key per batch — enforced here with
an explicit duplicate-key error, no silent nondeterminism).

Plan shape: ONE distributed anti join (hash shuffle on the merge key,
`ops/join` plan — the change set is usually violation-sized but the
plan never assumes it) + a zero-copy union.  Nothing rewrites rows
that did not change — at 100-TB base scale this plus partitioned
output is the difference between a merge and a rewrite.

RAQC analog: ST1's spirit (resume/lineage state) — SURVEY §2
relational surface; the forward application of the q110 table diff.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["apply_changes"]


def apply_changes(base_ds, delta_ds, on: str, op_col: str = "op"):
    """Next-version Dataset with exactly the base columns.  ``delta_ds``
    must carry the base columns plus ``op_col`` in {'I','U','D'} and
    at most one row per key (raises otherwise)."""
    from .join import anti_join

    base_cols = [c for c in base_ds.schema().names]

    # one row per key — a duplicated key would make the result depend
    # on block order; fail loudly (the cooc.max_distinct discipline)
    def check_dups(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({on: df[on].to_numpy()})

    keys = delta_ds.map_batches(check_dups, batch_format="pandas")
    n_keys = keys.count()
    from ray.data.aggregate import Count

    n_distinct = keys.groupby(on).aggregate(
        Count(alias_name="c")).count()
    if n_keys != n_distinct:
        raise ValueError(
            f"apply_changes: change set has {n_keys - n_distinct} "
            "duplicate keys — resolve last-writer-wins upstream")

    kept = anti_join(base_ds, delta_ds.select_columns([on]), on=on)
    puts = (delta_ds.filter(expr=f"{op_col} != 'D'")
            .select_columns(base_cols))
    return kept.select_columns(base_cols).union(puts)
