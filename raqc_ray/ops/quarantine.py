"""Quarantine composition — the two-tier validation plan: a cheap
container-level triage (``ops/pngaudit``, ``ops/dcstats``) marks
structurally damaged blobs, and the expensive full-decode pool runs
ONLY on the survivors.  This module is the glue between the tiers:
given the payload stream and the (small) set of condemned ids, drop
the condemned rows WITHOUT moving the payload bytes through a
shuffle.

Size-triggered path selection (the engine's `NearDupCheck` /
`dedup_corpus` discipline):

- **broadcast filter** (default regime): the condemned ids are
  violation-sized, so they are collected once, ``ray.put`` once, and
  every map task drops its rows with a vectorized ``isin`` — the
  payload stream never reshuffles, never rereads, never leaves its
  blocks.
- **hash anti-join** (fallback): if the condemned set exceeds
  ``broadcast_limit`` (mass corruption — at that point the job is an
  incident, not a pipeline), fall back to the distributed
  ``anti_join``; payload bytes pay one all-to-all, correctness is
  preserved.

Both paths are byte-identical under test (`test_quarantine`).

Gates: path-equivalence unit tests and the end-to-end driver oracle
`q178_triage_exposure_documents` — planted CRC rot triaged out, the
survivors' exposure stats matched against the closed form restricted
to the clean ids.
"""

from __future__ import annotations

import pandas as pd


def drop_quarantined(ds, bad_ids_ds, id_col: str = "image_id",
                     broadcast_limit: int = 1_000_000,
                     num_partitions: int | None = None):
    """Rows of ``ds`` whose ``id_col`` is NOT in ``bad_ids_ds`` (a
    Dataset with the id column, typically triage output).  Picks the
    broadcast-filter or anti-join path by the condemned count."""
    import ray

    bad_ids_ds = bad_ids_ds.select_columns([id_col])
    n_bad = bad_ids_ds.count()
    if n_bad == 0:
        # empty blocks may have lost the schema entirely — passthrough
        return ds
    if n_bad > broadcast_limit:
        from .join import anti_join

        return anti_join(ds, bad_ids_ds, on=id_col,
                         num_partitions=num_partitions)
    bad = frozenset(bad_ids_ds.to_pandas()[id_col].tolist())
    ref = ray.put(bad)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df[id_col].isin(ray.get(ref))]

    return ds.map_batches(keep, batch_format="pandas")
