"""Calibration curve (reliability diagram) — the score-vs-outcome
bucket table behind every classifier calibration plot, in PURE int64
arithmetic (no float anywhere, hash-stable under any layout).

Plan: the prepped ``(cents, label)`` stream is materialized once (the
aggregate and the bucket pass must see the SAME rows — the
`ops/moments.py` double-execution lesson from round-3 ADVICE), a tiny
``Max`` aggregate fixes the bucket width, and ONE combiner-fed
``map_batches`` collapses each block to ≤ ``n_buckets`` partial rows
before the bucket-count hash groupby — the shuffle moves
buckets × blocks rows, never the stream.

Domain contract: scores must be NON-NEGATIVE ints (``cents ≥ 0`` —
negative rows are dropped, mirrored by the oracle's ``WHERE cents >=
0``; floor-division bucketing is only monotone on that domain, the
`ops/outliers.py` round-3 lesson).

RAQC analog: none in SURVEY §2 — §2 training-data surface (quality /
relevance model evaluation: is the score actually monotone in the
outcome rate before it gates the corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def calibration_curve(ds, label_col: str, cents_col: str,
                      n_buckets: int = 10):
    """Bucket table ``(bucket, n, n_pos, sum_cents, mean_cents,
    pos_rate_ppm)``: rows bucketed by ``cents * n_buckets // (max+1)``
    (equal-width over the observed non-negative score range),
    ``mean_cents = Σcents // n`` and ``pos_rate_ppm = 10⁶·n_pos // n``
    — all floor-divisions of exact int64 sums, bit-identical to the
    SQL oracle."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def nonneg(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[cents_col].to_numpy() >= 0]

    m = ds.map_batches(nonneg, batch_format="pandas").materialize()
    mx = m.max(cents_col)
    if mx is None:  # zero non-negative rows: empty curve, declared schema
        return rd.from_pandas(pd.DataFrame({
            c: pd.Series(dtype="int64")
            for c in ("bucket", "n", "n_pos", "sum_cents",
                      "mean_cents", "pos_rate_ppm")}))
    mx = int(mx)
    width = np.int64(mx + 1)
    nb = np.int64(n_buckets)

    def block_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df[cents_col].to_numpy(dtype=np.int64)
        lab = df[label_col].to_numpy(dtype=np.int64)
        b = (c * nb) // width
        d = pd.DataFrame({"bucket": b, "n": np.ones(len(b), np.int64),
                          "n_pos": lab, "sum_cents": c})
        return d.groupby("bucket", sort=False, as_index=False).sum()

    agg = (m.map_batches(block_partial, batch_format="pandas")
           .groupby("bucket")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("n_pos", alias_name="n_pos"),
                      Sum("sum_cents", alias_name="sum_cents")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        for c in ("bucket", "n", "n_pos", "sum_cents"):
            out[c] = out[c].astype("int64")
        out["mean_cents"] = out["sum_cents"] // out["n"]
        out["pos_rate_ppm"] = (1_000_000 * out["n_pos"]) // out["n"]
        return out

    return agg.map_batches(finish, batch_format="pandas")
